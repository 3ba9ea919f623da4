"""WAV codec (sources/wav.py) + its wiring into audio_features.

Round-trip tests assert bit-exact sample recovery on the
quantization grid for 8/16-bit, mono/stereo; the feature test checks
the numpy math against closed-form values for a synthetic square
wave; corrupt/truncated/non-PCM payloads must be dropped, not raised,
once inside the Spark operator.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ferenda_spark.sources.wav import decode_wav, encode_wav


def _square(n: int, period: int, amp: float = 0.5) -> np.ndarray:
    return amp * np.where((np.arange(n) // (period // 2)) % 2 == 0, 1.0, -1.0)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_bit_exact(bits, channels):
    scale = 128.0 if bits == 8 else 32768.0
    # values on the quantization grid survive encode->decode exactly
    grid = np.round(_square(400, 20) * scale) / scale
    samples = np.stack([grid] * channels, axis=1)
    out, rate = decode_wav(encode_wav(samples, 8000, bits=bits))
    assert rate == 8000
    assert out.shape == (400, channels)
    np.testing.assert_array_equal(out, samples)


def test_word_aligned_odd_chunk_and_extra_chunks():
    # a LIST chunk with odd length before fmt/data must be skipped
    # with word-aligned advance
    wav = encode_wav(_square(100, 10)[:, None], 16000)
    body = wav[12:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    patched = b"RIFF" + struct.pack("<I", 4 + len(odd) + len(body)) + b"WAVE" + odd + body
    out, rate = decode_wav(patched)
    assert rate == 16000 and out.shape[0] == 100


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                               # truncated header
        lambda b: b"JUNK" + b[4:],                      # bad magic
        lambda b: b[:20] + struct.pack("<H", 3) + b[22:],  # non-PCM format
        lambda b: b[:-7],                               # truncated data chunk
    ],
)
def test_rejects_out_of_scope(mutate):
    wav = encode_wav(_square(64, 8)[:, None], 8000)
    with pytest.raises(ValueError):
        decode_wav(mutate(wav))


def test_audio_features_math_and_drops(spark):
    from ferenda_spark.operators.multimodal import audio_features

    # square wave at full grid precision: rms == peak == amp,
    # one sign flip per half period
    period, n, amp = 20, 8000, 0.5
    sq = _square(n, period, amp)[:, None]
    good = encode_wav(sq, 8000)
    stereo = encode_wav(np.stack([sq[:, 0], sq[:, 0]], axis=1), 16000)
    rows = [
        (0, "audio", bytearray(good), None),
        (1, "audio", bytearray(stereo), None),
        (2, "audio", bytearray(b"not a wav at all"), None),  # dropped
        (3, "audio", None, None),                            # dropped
        (4, "video", bytearray(good), None),                 # filtered by kind
    ]
    df = spark.createDataFrame(
        rows, "id long, kind string, payload binary, meta map<string,int>"
    )
    got = {r["id"]: r for r in audio_features(df).collect()}
    assert set(got) == {0, 1}
    f = got[0]
    assert f["sample_rate"] == 8000 and f["n_channels"] == 1
    assert f["duration_s"] == 1.0
    assert f["rms"] == pytest.approx(amp, abs=1e-4)
    assert f["peak"] == pytest.approx(amp, abs=1e-4)
    # sign flips every period/2 samples -> rate 1/(period/2)
    assert f["zero_crossing_rate"] == pytest.approx(2 / period, abs=1e-3)
    assert got[1]["n_channels"] == 2
    assert got[1]["duration_s"] == 0.5  # 8000 frames at 16 kHz
