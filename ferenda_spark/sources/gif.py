"""GIF decoder (87a/89a) — stdlib + numpy, no native deps.

Completes the web's legacy image trio next to sources/png.py and
sources/jpeg.py for the multimodal default codec: LZW decompression
(variable code width, clear/EOI codes), global/local color tables,
interlaced row ordering, and GIF89a transparency composited over
white (same convention as the PNG alpha composite).  Scope: the
FIRST image frame (document thumbnails/figures — the corpus shape;
animation frames beyond the first are ignored by design).
ValueError on anything malformed — the callers' drop-the-row
contract."""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: interlace pass layout: (start row, step)
_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: code width grows 3..12 bits, CLEAR resets
    the table, EOI ends; emitted indices are color-table entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first within bytes
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _subblocks(d: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if i >= len(d):
            raise ValueError("gif: unterminated sub-blocks")
        n = d[i]
        i += 1
        if n == 0:
            return bytes(out), i
        out += d[i : i + n]
        if len(out) and i + n > len(d):
            raise ValueError("gif: truncated sub-block")
        i += n
    # unreachable


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB (first frame; transparency
    composited over white)."""
    if not payload or payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    d = payload
    if len(d) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", d[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(d[i : i + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("gif: truncated global color table")
        gct = gct.reshape(n, 3)
        i += 3 * n
    transparent = None
    while i < len(d):
        b = d[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if i + 2 > len(d):
                raise ValueError("gif: truncated extension")
            label = d[i + 1]
            body, j = _subblocks(d, i + 2)
            if label == 0xF9 and len(body) >= 4:  # GCE
                if body[0] & 0x01:
                    transparent = body[3]
            i = j
            continue
        if b == 0x2C:  # image descriptor
            if i + 10 > len(d):
                raise ValueError("gif: truncated image descriptor")
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", d[i + 1 : i + 10])
            if w == 0 or h == 0:
                raise ValueError("gif: empty image frame")
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(d[i : i + 3 * n], dtype=np.uint8)
                if lct.size != 3 * n:
                    raise ValueError("gif: truncated local color table")
                ct = lct.reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("gif: no color table")
            if i >= len(d):
                raise ValueError("gif: missing LZW code size")
            mcs = d[i]
            if not 2 <= mcs <= 11:
                raise ValueError("gif: bad LZW min code size")
            data, i = _subblocks(d, i + 1)
            idx = np.frombuffer(
                _lzw_decode(mcs, data, w * h), dtype=np.uint8
            ).reshape(h, w)
            if np.any(idx >= ct.shape[0]):
                raise ValueError("gif: pixel index outside color table")
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.zeros_like(idx)
                src = 0
                for start, step in _INTERLACE:
                    for row in range(start, h, step):
                        ordered[row] = idx[src]
                        src += 1
                idx = ordered
            rgb = ct[idx].astype(np.uint8)
            if transparent is not None:
                rgb = rgb.copy()
                rgb[idx == transparent] = 255  # composite over white
            return rgb
        raise ValueError(f"gif: unexpected block 0x{b:02x}")
    raise ValueError("gif: no image data")
