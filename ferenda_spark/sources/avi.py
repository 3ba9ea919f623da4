"""Dependency-free uncompressed-AVI (RIFF 'AVI ') video codec.

Retires the VIDEO third of the S4 media-decode seam the same way
sources/png.py (images) and sources/wav.py (audio) retired theirs:
multimodal.sample_frames can run a REAL bytes→frames path
hermetically for uncompressed DIB AVIs — no ffmpeg in the container.
Compressed codecs (H.264/VP9/...) genuinely require ffmpeg and stay
behind the decode_fn seam; this module is the real default for the
archival/raw-capture payloads that don't.

Scope (documented, checked, raised on violation — not silently
wrong):
- RIFF/'AVI ' with one 'vids' stream;
- frames stored as '00db'/'00dc' chunks of BI_RGB (biCompression 0)
  24-bit bottom-up DIBs, rows padded to 4 bytes (the standard
  uncompressed-AVI layout);
- timing from the stream header's dwRate/dwScale, falling back to
  the main header's dwMicroSecPerFrame.

Decode is one struct walk over the chunk tree plus one
np.frombuffer + row-flip per frame — O(bytes), no Python per-pixel
loop.  Payloads arrive through mapInPandas Arrow batches, never a
per-row UDF.  The encoder exists for tests and fixture synthesis: it
emits a canonical single-'movi' uncompressed AVI whose
encode→decode round trip is bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) over a RIFF chunk run;
    LIST chunks are yielded as ('LIST:' + list_type, ...) with the
    body excluding the 4-byte list type."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > end:
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST":
            if length < 4:
                # a LIST body starts with its 4-byte list type; a
                # shorter declared length would read the type from
                # the NEXT chunk's bytes and yield a negative body
                raise ValueError("truncated AVI LIST chunk")
            yield (b"LIST:" + buf[body : body + 4], body + 4, length - 4)
        else:
            yield (fourcc, body, length)
        pos = body + length + (length & 1)  # chunks are word-aligned


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """payload → (frames uint8 shaped (n, height, width, 3) in RGB,
    frame_duration_ms).  Raises ValueError on anything outside the
    documented scope; callers treat that as 'undecodable'."""
    if (
        len(payload) < 12
        or payload[:4] != AVI_MAGIC
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")
    avih = strh = strf = None
    movi: list[tuple[int, int]] = []
    for cc, start, length in _walk_chunks(payload, 12, len(payload)):
        if cc == b"LIST:hdrl":
            for cc2, s2, l2 in _walk_chunks(payload, start, start + length):
                if cc2 == b"avih":
                    avih = payload[s2 : s2 + l2]
                elif cc2 == b"LIST:strl":
                    for cc3, s3, l3 in _walk_chunks(payload, s2, s2 + l2):
                        if cc3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                            strh = payload[s3 : s3 + l3]
                        elif cc3 == b"strf" and strh is not None and strf is None:
                            strf = payload[s3 : s3 + l3]
        elif cc == b"LIST:movi":
            for cc2, s2, l2 in _walk_chunks(payload, start, start + length):
                if cc2[2:4] in (b"db", b"dc"):
                    movi.append((s2, l2))
    if avih is None or strh is None or strf is None:
        raise ValueError("missing avih/strh/strf header")
    if len(strf) < 40:
        raise ValueError("short BITMAPINFOHEADER")
    _, width, height, _, bits, compression = struct.unpack(
        "<IiiHHI", strf[:20]
    )
    if compression != 0 or bits != 24:
        raise ValueError(
            f"compressed or non-24-bit AVI (biCompression={compression}, "
            f"bits={bits}) — needs an ffmpeg decode_fn"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate frame dimensions")
    # frame timing: stream dwRate/dwScale, else 1e6/dwMicroSecPerFrame.
    # Length-check before unpack: struct.error on a short header
    # would escape the callers' ValueError drop-the-row contract.
    if len(strh) < 28:
        raise ValueError("short AVI stream header")
    scale, rate = struct.unpack("<II", strh[20:28])
    if rate and scale:
        frame_ms = 1000.0 * scale / rate
    else:
        if len(avih) < 4:
            raise ValueError("short AVI main header")
        (usec,) = struct.unpack("<I", avih[0:4])
        if not usec:
            raise ValueError("no frame timing in headers")
        frame_ms = usec / 1000.0
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # DIB rows pad to 4 bytes
    frames = np.empty((len(movi), height, width, 3), dtype=np.uint8)
    for n, (start, length) in enumerate(movi):
        if length < stride * height:
            raise ValueError("truncated frame chunk")
        rows = np.frombuffer(
            payload[start : start + stride * height], dtype=np.uint8
        ).reshape(height, stride)[:, :row_bytes]
        img = rows.reshape(height, width, 3)
        if bottom_up:
            img = img[::-1]
        frames[n] = img[:, :, ::-1]  # DIB stores BGR
    return frames, frame_ms


def encode_avi(frames: np.ndarray, fps: float = 25.0) -> bytes:
    """(n, height, width, 3) uint8 RGB → canonical uncompressed AVI
    bytes (one 'movi' list of '00db' DIB chunks).  Encoder-decoder
    round trips are bit-exact (the round-trip test's contract)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3)")
    n, height, width, _ = frames.shape
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    usec = int(round(1_000_000 / fps))

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I", usec, 0, 0, 0, n, 0, 1, stride * height, width, height, 0, 0, 0, 0
    )
    # AVIStreamHeader: fccType, fccHandler, dwFlags, wPriority+wLang,
    # dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize, rcFrame
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IIIIIIIIII", 0, 0, 0, 1000, int(round(fps * 1000)), 0, n,
            stride * height, 0, 0,
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        chunk(
            b"00db",
            np.pad(
                f[::-1, :, ::-1].reshape(height, row_bytes),
                ((0, 0), (0, stride - row_bytes)),
            ).tobytes(),
        )
        for f in frames
    )
    body = b"AVI " + hdrl + list_chunk(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body
