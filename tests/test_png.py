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
    # declaring Adam7 over non-interlaced-sized pixel data is a
    # size mismatch (the pass layout needs different byte counts)
    ihdr = bytearray(struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    bad = PNG_MAGIC + _chunk(b"IHDR", bytes(ihdr)) + good[33:]
    with pytest.raises(ValueError):
        decode_png(bad)
    # interlace method outside {0,1}
    ihdr2 = bytearray(struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2))
    bad2 = PNG_MAGIC + _chunk(b"IHDR", bytes(ihdr2)) + good[33:]
    with pytest.raises(ValueError):
        decode_png(bad2)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_adam7(img: np.ndarray) -> bytes:
    """Test-side Adam7 RGB encoder: seven filter-0 sub-images in
    pass order — independent of the decoder under test."""
    h, w, _ = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        if w <= x0 or h <= y0:
            continue
        sub = img[y0::dy, x0::dx]
        for row in sub:
            raw += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("dims", [(8, 8), (9, 13), (3, 2), (1, 1), (16, 5)])
def test_adam7_roundtrip(dims):
    """Adam7 decode reconstructs the exact pixels for sizes that
    exercise full, partial and empty passes (spec §8.2)."""
    h, w = dims
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_encode_adam7(img)), img)


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
