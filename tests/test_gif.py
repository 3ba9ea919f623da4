"""GIF decoder (sources/gif.py) against hand-assembled files: a
minimal in-test LZW encoder builds real GIF87a/89a bytes independent
of the decoder (same fixture strategy as test_jpeg.py)."""

import struct

import numpy as np
import pytest

from ferenda_spark.sources.gif import decode_gif


class _LzwEncoder:
    """Reference GIF-LZW encoder (dict-based, LSB-first packing)."""

    def __init__(self, min_code_size: int):
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def encode(self, indices: bytes) -> bytes:
        table = {bytes([i]): i for i in range(self.clear)}
        next_code = self.eoi + 1
        width = self.mcs + 1
        self._put(self.clear, width)
        buf = b""
        for ch in indices:
            cand = buf + bytes([ch])
            if cand in table:
                buf = cand
                continue
            self._put(table[buf], width)
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                # decoder grows width when its table FILLS the span
                width += 1
            buf = bytes([ch])
        if buf:
            self._put(table[buf], width)
        self._put(self.eoi, width)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(
    idx: np.ndarray,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    transparent: int | None = None,
    magic: bytes = b"GIF89a",
) -> bytes:
    h, w = idx.shape
    n = max(2, 1 << max(1, (len(palette) - 1).bit_length()))
    gct_flag = 0x80 | (n.bit_length() - 2)
    out = bytearray(magic)
    out += struct.pack("<HHBBB", w, h, gct_flag, 0, 0)
    for k in range(n):
        out += bytes(palette[k] if k < len(palette) else (0, 0, 0))
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    mcs = max(2, n.bit_length() - 1)
    rows = idx
    if interlace:
        order = []
        for start, step in [(0, 8), (4, 8), (2, 4), (1, 2)]:
            order.extend(range(start, h, step))
        rows = idx[order]
    data = _LzwEncoder(mcs).encode(rows.tobytes())
    out += bytes([mcs]) + _blocks(data)
    out += bytes([0x3B])
    return bytes(out)


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_basic_decode():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    rgb = decode_gif(make_gif(idx, PAL, magic=b"GIF87a"))
    assert rgb.shape == (2, 2, 3)
    assert np.array_equal(rgb, np.array(PAL, dtype=np.uint8)[idx])


def test_lzw_repetition_and_width_growth():
    """A 32×32 patterned image forces table growth past 2 width
    bumps; decode must reproduce every index."""
    rng = np.random.RandomState(7)
    idx = (rng.randint(0, 4, size=(32, 32))).astype(np.uint8)
    rgb = decode_gif(make_gif(idx, PAL))
    assert np.array_equal(rgb, np.array(PAL, dtype=np.uint8)[idx])


def test_interlaced_rows_reordered():
    idx = np.tile(np.arange(16, dtype=np.uint8).reshape(16, 1) % 4, (1, 4))
    plain = decode_gif(make_gif(idx, PAL, interlace=False))
    inter = decode_gif(make_gif(idx, PAL, interlace=True))
    assert np.array_equal(plain, inter)


def test_transparency_composites_white():
    idx = np.array([[0, 1]], dtype=np.uint8)
    rgb = decode_gif(make_gif(idx, PAL, transparent=1))
    assert tuple(rgb[0, 0]) == PAL[0]
    assert tuple(rgb[0, 1]) == (255, 255, 255)


def test_corrupt_raises_valueerror():
    ok = make_gif(np.array([[0, 1], [2, 3]], dtype=np.uint8), PAL)
    for bad in [
        b"",
        b"GIF89a",
        ok[:20],
        ok[:6] + b"\xff" * (len(ok) - 6),
        ok.replace(b"\x2c", b"\x7c", 1),
    ]:
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_resize_images_real_gif_path(spark):
    from ferenda_spark.operators import multimodal as M

    idx = np.zeros((4, 4), dtype=np.uint8)
    payload = make_gif(idx, PAL)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(payload), ("image/gif", 4, 4, None)),
            (2, "image", bytearray(b"GIF89a" + b"\x00" * 8), ("image/gif", 4, 4, None)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r["id"]: r for r in M.resize_images(media, 2, 2).collect()}
    assert set(rows) == {1}
    got = np.frombuffer(bytes(rows[1]["rgb"]), np.uint8).reshape(2, 2, 3)
    assert np.all(got == np.array(PAL[0], dtype=np.uint8))


def test_zero_dimension_frame_rejected():
    ok = make_gif(np.array([[0, 1]], dtype=np.uint8), PAL)
    i = ok.index(bytes([0x2C]))
    zero_w = ok[: i + 5] + struct.pack("<H", 0) + ok[i + 7 :]
    with pytest.raises(ValueError):
        decode_gif(zero_w)
