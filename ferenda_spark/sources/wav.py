"""Dependency-free WAV (RIFF PCM) codec (stdlib struct + numpy).

Retires the AUDIO half of the S4 media-decode seam the same way
sources/png.py retired the image half: multimodal.audio_features can
now run a REAL bytes→waveform→features path hermetically — no
librosa/soundfile in the container.  (Video frame decode remains the
one documented seam — it genuinely requires ffmpeg.)

Scope (documented, checked, raised on violation — not silently
wrong):
- RIFF/WAVE with a PCM `fmt ` chunk (audio_format 1);
- 8-bit unsigned or 16-bit signed little-endian samples;
- any channel count / sample rate; extra chunks (LIST, cue) skipped.

Decode is one struct walk over the chunk list plus one
np.frombuffer + scale — O(bytes), no Python per-sample loop.
Payloads arrive through mapInPandas Arrow batches, never a per-row
UDF.  The encoder exists for tests and fixture synthesis: it emits a
canonical 44-byte-header single-data-chunk PCM WAV.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """payload → (samples float64 in [-1, 1] shaped (frames,
    channels), sample_rate).  Raises ValueError on anything outside
    the documented scope; callers treat that as 'undecodable'."""
    if len(payload) < 12 or payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV (format {audio_format})")
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    if n_channels < 1 or block_align != n_channels * (bits // 8):
        raise ValueError("inconsistent channel/block layout")
    usable = len(data) - (len(data) % block_align)
    if bits == 8:
        raw = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0
    else:
        raw = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
        samples = raw / 32768.0
    return samples.reshape(-1, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(frames, channels) float array in [-1, 1] → canonical PCM WAV
    bytes.  Encoder-decoder round trips are bit-exact for values on
    the quantization grid (the round-trip test's contract)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_channels = samples.shape[1]
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 8:
        pcm = (np.round(clipped * 128.0) + 128.0).clip(0, 255).astype(np.uint8)
    elif bits == 16:
        pcm = np.round(clipped * 32768.0).clip(-32768, 32767).astype("<i2")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    data = pcm.tobytes()
    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
