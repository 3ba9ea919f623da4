"""Dependency-free PNG codec (stdlib zlib + numpy).

Retires the image half of the S4 decode seam (multimodal.py): the
reference ships working binary-document readers (pdfreader.py,
wordreader.py); our office.py restated those for docx/pdf, and this
module does the same for raster images so `resize_images` can run a
REAL byte→pixels→resize path hermetically — no PIL in the container.

Scope (documented, checked, raised on violation — not silently
wrong):
- 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); alpha is composited over white so the
  output is always H×W×3 uint8.
- both interlace methods: none and Adam7 (the seven
  independently-filtered sub-images unfilter separately and scatter
  back onto the pass lattice — spec §8.2).

Decode cost is one zlib.decompress plus per-scanline unfiltering:
filters None/Sub/Up are numpy-vectorized over the row (Sub is a
per-channel cumsum mod 256); Average/Paeth fall back to a per-pixel
loop because each reconstruction reads the just-reconstructed left
neighbor.  Payloads arrive through mapInPandas Arrow batches, so
this never runs per-row through a Python UDF row serializer.

The encoder exists for tests and thumbnail sinks: it emits a valid
single-IDAT non-interlaced RGB PNG and can force any filter type
per image, which is exactly what lets the round-trip test exercise
every unfilter branch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(payload: bytes):
    """Yield (type, data) for each chunk; validates lengths only
    (CRCs are trusted — corrupt streams fail in zlib or shape
    checks, and the caller treats ValueError as 'undecodable')."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → (height, stride) uint8 of raw
    sample bytes.  `raw` is the decompressed stream reshaped to
    (height, 1+stride); column 0 is the filter type."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: per-channel cumsum mod 256
            recon = line.copy()
            for j in range(bpp):
                recon[j::bpp] = np.cumsum(line[j::bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prior) & 0xFF
        elif ftype == 3:  # Average — left-recursive, per-pixel
            recon = line.copy()
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — left-recursive, per-pixel
            recon = line.copy()
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                recon[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out


#: Adam7 pass grid: (x-origin, y-origin, x-stride, y-stride) per
#: pass, spec §8.2 — each pass is an independently-filtered
#: sub-image whose pixels scatter back on this lattice
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB.  Raises ValueError on
    anything outside the documented scope (callers drop the row —
    the reference skips undecodable sources the same way)."""
    if not payload or not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    width = height = None
    color = depth = interlace = 0
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if len(data) != 13:
                # struct.error here would escape the callers'
                # ValueError drop-the-row contract
                raise ValueError("malformed IHDR (must be 13 bytes)")
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if not width or not height:
        raise ValueError("missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    ch = _CHANNELS[color]
    if interlace:
        # Adam7: seven independently-filtered sub-images
        passes = [
            (x0, y0, dx, dy, -(-(width - x0) // dx), -(-(height - y0) // dy))
            for x0, y0, dx, dy in _ADAM7
            if width > x0 and height > y0
        ]
        expected = sum(ph * (pw * ch + 1) for *_, pw, ph in passes)
    else:
        stride = width * ch
        expected = height * (stride + 1)
    # bounded inflate: the exact output size is known from IHDR, so
    # cap at expected+1 — a decompression bomb becomes the ordinary
    # size-mismatch ValueError instead of materializing gigabytes
    # inside an executor before the size check runs
    d = zlib.decompressobj()
    raw = np.frombuffer(
        d.decompress(bytes(idat), expected + 1), dtype=np.uint8
    )
    if raw.size != expected or not (d.eof or d.unconsumed_tail == b""):
        raise ValueError("PNG pixel data size mismatch")
    if interlace:
        px = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            pstride = pw * ch
            size = ph * (pstride + 1)
            sub = _unfilter(
                raw[off : off + size].reshape(ph, pstride + 1), ph, pstride, ch
            ).reshape(ph, pw, ch)
            px[y0::dy, x0::dx] = sub
            off += size
    else:
        px = _unfilter(
            raw.reshape(height, stride + 1), height, stride, ch
        ).reshape(height, width, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        if int(px[:, :, 0].max(initial=0)) >= len(palette):
            # IndexError would escape the ValueError drop contract
            raise ValueError("palette index out of range")
        return palette[px[:, :, 0]]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    # alpha types: composite over white (round-half-up like libpng)
    if color == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2).astype(np.uint16)
        a = px[:, :, 1:2].astype(np.uint16)
    else:  # 6
        rgb = px[:, :, :3].astype(np.uint16)
        a = px[:, :, 3:4].astype(np.uint16)
    return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 → non-interlaced RGB PNG, every scanline
    filtered with `filter_type` (0-4).  Filters other than 0 exist
    so tests can force each unfilter branch in decode_png."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, ch = rgb.shape
    if ch != 3:
        raise ValueError("encode_png expects H,W,3")
    bpp = 3
    flat = rgb.reshape(h, w * bpp).astype(np.int32)
    lines = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        recon = flat[y]
        if filter_type == 0:
            filt = recon
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), recon[:-bpp]])
            filt = (recon - left) & 0xFF
        elif filter_type == 2:
            filt = (recon - prior) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), recon[:-bpp]])
            filt = (recon - ((left + prior) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), recon[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
            p = left + prior - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prior),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            filt = (recon - pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(filter_type)
        lines += filt.astype(np.uint8).tobytes()
        prior = recon

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
