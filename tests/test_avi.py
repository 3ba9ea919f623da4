"""AVI codec (sources/avi.py) + its wiring into sample_frames.

Round-trip tests assert bit-exact frame recovery (including odd
widths, which exercise the 4-byte DIB row padding); the sampling
test checks the timestamp grid and nearest-frame index math against
hand-computed values; corrupt/compressed/non-AVI payloads must be
dropped, not raised, once inside the Spark operator; the plan/real
consistency test checks sample_frames lands on frame_sample_plan's
timestamp grid.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ferenda_spark.sources.avi import decode_avi, encode_avi


def _frames(n: int, h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w", [8, 7])  # 7 → 21-byte rows pad to 24
def test_roundtrip_bit_exact(w):
    fr = _frames(5, 9, w)
    out, frame_ms = decode_avi(encode_avi(fr, fps=25.0))
    assert frame_ms == pytest.approx(40.0)
    np.testing.assert_array_equal(out, fr)


def test_fractional_fps_timing():
    _, frame_ms = decode_avi(encode_avi(_frames(2, 4, 4), fps=12.5))
    assert frame_ms == pytest.approx(80.0)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                                # truncated header
        lambda b: b"JUNK" + b[4:],                       # bad magic
        lambda b: b[:8] + b"WAVE" + b[12:],              # wrong RIFF type
        lambda b: b[:-9],                                # truncated movi chunk
    ],
)
def test_rejects_out_of_scope(mutate):
    avi = encode_avi(_frames(3, 4, 4))
    with pytest.raises(ValueError):
        decode_avi(mutate(avi))


def test_rejects_compressed():
    avi = bytearray(encode_avi(_frames(1, 4, 4)))
    # flip biCompression (strf body offset 16) to a codec fourcc
    off = avi.find(b"strf") + 8 + 16
    avi[off : off + 4] = struct.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(ValueError, match="ffmpeg"):
        decode_avi(bytes(avi))


def test_sample_frames_grid_and_drops(spark):
    from ferenda_spark.operators.multimodal import (
        frame_sample_plan,
        sample_frames,
    )

    # 10 frames at 10 fps = 1000 ms; sampling every 300 ms hits
    # ts 0/300/600/900 → frame indices 0/3/6/9
    fr = _frames(10, 6, 5)
    good = encode_avi(fr, fps=10.0)
    rows = [
        (0, "video", bytearray(good), {"duration_ms": 1000}),
        (1, "video", bytearray(b"not an avi"), {"duration_ms": 1000}),  # dropped
        (2, "video", None, {"duration_ms": 1000}),                      # dropped
        (3, "image", bytearray(good), {"duration_ms": 1000}),           # kind-filtered
    ]
    df = spark.createDataFrame(
        rows, "id long, kind string, payload binary, meta struct<duration_ms:long>"
    )
    got = sample_frames(df, every_ms=300).collect()
    assert {r["id"] for r in got} == {0}
    by_ts = {r["frame_ts_ms"]: r for r in sorted(got, key=lambda r: r["frame_ts_ms"])}
    assert list(by_ts) == [0, 300, 600, 900]
    for ts, k in [(0, 0), (300, 3), (600, 6), (900, 9)]:
        r = by_ts[ts]
        assert (r["width"], r["height"]) == (5, 6)
        assert bytes(r["rgb"]) == fr[k].tobytes()
    # the real sampler lands exactly on the plan's timestamp grid
    plan = frame_sample_plan(df.filter("id = 0"), every_ms=300).collect()
    assert sorted(p["frame_ts_ms"] for p in plan) == list(by_ts)


def test_corrupt_headers_raise_valueerror_only():
    """Short strh/avih and undersized LIST chunks raise ValueError,
    never struct.error or misattributed garbage reads."""
    import struct

    import pytest

    from ferenda_spark.sources.avi import decode_avi, encode_avi

    good = encode_avi(np.zeros((1, 2, 2, 3), np.uint8))

    # truncate the strh payload: find it and shrink its declared size
    i = good.index(b"strh")
    short = bytearray(good)
    short[i + 4 : i + 8] = struct.pack("<I", 8)  # strh body now 8 bytes
    with pytest.raises(ValueError):
        decode_avi(bytes(short))

    # LIST with declared length < 4
    lst = bytearray(good)
    j = lst.index(b"LIST")
    lst[j + 4 : j + 8] = struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_avi(bytes(lst))
