"""PNG codec (sources/png.py) + its wiring into resize_images.

The encoder can force any scanline filter, so the round-trip test
exercises every unfilter branch (None/Sub/Up/Average/Paeth) against
bit-exact pixel equality; the color-type tests hand-build chunk
streams for gray/palette/alpha images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ferenda_spark.sources.png import PNG_MAGIC, decode_png, encode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _raw_png(width, height, color, pixels: bytes, plte: bytes = b"") -> bytes:
    """Hand-assembled non-interlaced 8-bit PNG with filter-0 rows."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = width * ch
    lines = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    out = PNG_MAGIC + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    )
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(filter_type):
    rng = np.random.Generator(np.random.PCG64(7))
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    payload = encode_png(img, filter_type=filter_type)
    assert payload.startswith(PNG_MAGIC)
    got = decode_png(payload)
    assert got.dtype == np.uint8 and got.shape == (13, 9, 3)
    np.testing.assert_array_equal(got, img)


def test_grayscale_expands_to_rgb():
    got = decode_png(_raw_png(2, 2, 0, bytes([0, 80, 160, 255])))
    np.testing.assert_array_equal(
        got, np.array([[[0] * 3, [80] * 3], [[160] * 3, [255] * 3]], np.uint8)
    )


def test_palette_lookup():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # r, g, b entries
    got = decode_png(_raw_png(3, 1, 3, bytes([2, 0, 1]), plte=plte))
    np.testing.assert_array_equal(
        got, np.array([[[0, 0, 255], [255, 0, 0], [0, 255, 0]]], np.uint8)
    )


def test_alpha_composites_over_white():
    # RGBA: opaque red, transparent anything, half-alpha black
    px = bytes([255, 0, 0, 255, 10, 20, 30, 0, 0, 0, 0, 128])
    got = decode_png(_raw_png(3, 1, 6, px))
    np.testing.assert_array_equal(got[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(got[0, 1], [255, 255, 255])
    # 0*128/255 + 255*127/255 = 127 (round-half-up)
    np.testing.assert_array_equal(got[0, 2], [127, 127, 127])
    # gray+alpha variant of the same math
    got2 = decode_png(_raw_png(1, 1, 4, bytes([0, 128])))
    np.testing.assert_array_equal(got2[0, 0], [127, 127, 127])


def test_rejects_out_of_scope():
    img = np.zeros((2, 2, 3), np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated mid-chunk
    # interlaced: flip the IHDR interlace byte (offset: 8 magic +
    # 8 hdr + 12th IHDR byte) and re-CRC
    ihdr = bytearray(struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    bad = PNG_MAGIC + _chunk(b"IHDR", bytes(ihdr)) + good[33:]
    with pytest.raises(ValueError):
        decode_png(bad)


def test_resize_images_real_png_path(spark):
    """End-to-end: a REAL PNG payload through the default codec —
    byte→pixels is sources/png.py, not the fake — then the
    nearest-neighbor downsample picks pixels (1,1),(1,3),(3,1),(3,3)."""
    from ferenda_spark.operators import multimodal as M

    base = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payload = encode_png(base, filter_type=4)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(payload), ("image/png", 4, 4, None)),
            # corrupt PNG: magic ok, body garbage -> dropped, no crash
            (2, "image", bytearray(PNG_MAGIC + b"\x00" * 16), ("image/png", 4, 4, None)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r["id"]: r for r in M.resize_images(media, 2, 2).collect()}
    assert set(rows) == {1}
    got = np.frombuffer(bytes(rows[1]["rgb"]), np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(got, base[np.ix_([1, 3], [1, 3])])


def test_corrupt_structures_raise_valueerror_only():
    """Every corrupt-payload path raises ValueError (the callers'
    drop-the-row contract) — never struct.error / IndexError."""
    import struct
    import zlib as _z

    import pytest

    from ferenda_spark.sources.png import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data))
        )

    # IHDR body shorter than 13 bytes
    bad_ihdr = PNG_MAGIC + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad_ihdr)

    # palette image whose pixel indices exceed the PLTE entry count
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = bytes([0, 0, 5])  # filter 0, indices 0 and 5; palette has 1
    oob = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\x10\x20\x30")
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(oob)

    # decompression bomb: IDAT inflates far beyond the declared
    # dims — bounded inflate turns it into the size-mismatch error
    bomb_raw = b"\x00" * (50 * 1024 * 1024)
    bomb = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(bomb_raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bomb)
