"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's analog is its binary document intake (PDFs/DOC via
pdfreader.py / wordreader.py — SURVEY.md §2.1 S4): bytes in, typed
structure out, decoder pluggable per format.  Here the contract is
Spark-first:

- media rows are `(id, kind, payload BINARY, meta STRUCT)`;
- every transform is `mapInPandas` over Arrow batches — payloads
  never pass through per-row Python, and batch size bounds executor
  memory (`spark.sql.execution.arrow.maxRecordsPerBatch`);
- the *codec* is pluggable per format: PNG images decode for real
  (sources/png.py), PCM WAV audio decodes for real (sources/wav.py,
  see audio_features), docx/pdf documents decode for real
  (sources/office.py), uncompressed-AVI video frames decode for
  real (sources/avi.py, see sample_frames); only COMPRESSED video
  (H.264/VP9/...) remains behind the decode_fn seam (ffmpeg
  genuinely required — `real_decode_stub`).  The generic
  extract_features keeps a deterministic md5-seeded fake for
  formats without a hermetic codec, keeping schemas/partitioning/
  tests real; at deployment, pass a real decode_fn (PIL/librosa/
  ffmpeg) — nothing else changes.

Scale notes: media payloads dominate row size, so feature extraction
projects payload *out* as early as possible (select only id+features
after the UDF); repartition upstream by id so one batch never holds
more than `maxRecordsPerBatch × max_payload` bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("payload_md5", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fake_decode(payload: bytes, kind: str, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-chain over the
    payload → `dim` floats in [0, 1).  Replace via decode_fn."""
    out, h = [], hashlib.md5(kind.encode() + (payload or b"")).digest()
    while len(out) < dim:
        for i in range(0, 16, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
        h = hashlib.md5(h).digest()
    return out[:dim]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decode_fn: Callable[[bytes, str, int], list[float]] | None = None,
) -> DataFrame:
    """media → (id, kind, payload_bytes, payload_md5, feature).

    `decode_fn(payload, kind, dim)` is the pluggable codec; the
    default fake keeps CI hermetic.  Real decode (image resize,
    audio spectrogram, video frame-sample) raises ImportError here —
    see `real_decode_stub`."""
    fn = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "payload_md5": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": [
                        fn(p, k, dim) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def real_decode_stub(payload: bytes, kind: str, dim: int) -> list[float]:
    """The COMPRESSED-video codec seam — the one remaining stub.
    Requires ffmpeg, which this container does not ship.  DOCUMENT
    payloads (docx/pdf) do NOT go through this seam — they have real
    dependency-free codecs in ferenda_spark.sources.office
    (read_office) — and neither do PNG IMAGES
    (ferenda_spark.sources.png, the default resize_images codec),
    PCM WAV AUDIO (ferenda_spark.sources.wav, the default
    audio_features codec), nor UNCOMPRESSED-AVI VIDEO
    (ferenda_spark.sources.avi, the default sample_frames codec)."""
    raise NotImplementedError(
        "compressed video frame decode requires ffmpeg; pass a "
        "decode_fn built on it at deployment — the Spark plumbing "
        "is unchanged"
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("rgb", T.BinaryType(), False),
    ]
)


def _fake_rgb_decode(payload: bytes, width: int, height: int):
    """Deterministic stand-in for non-PNG image codecs: PCG64 seeded
    from the payload md5 → H×W×3 uint8 array.  PNG payloads never
    reach this — _default_rgb_decode routes them through the real
    decoder in ferenda_spark.sources.png."""
    import numpy as np

    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _default_rgb_decode(payload: bytes, width: int, height: int):
    """Default resize_images codec: REAL dependency-free decoders,
    magic-sniffed — PNG (sources/png.py: zlib inflate + scanline
    unfilter + alpha composite) and baseline JPEG
    (sources/jpeg.py: Huffman + dequant + vectorized IDCT +
    4:2:0/4:2:2 upsample); deterministic fake for other formats
    (pass a custom decode_rgb at deployment for e.g. WebP).  The
    meta dims are a hint only: real decodes trust the header."""
    from ferenda_spark.sources.gif import GIF_MAGICS, decode_gif
    from ferenda_spark.sources.jpeg import JPEG_MAGIC, decode_jpeg
    from ferenda_spark.sources.png import PNG_MAGIC, decode_png

    if payload and bytes(payload[:8]) == PNG_MAGIC:
        return decode_png(bytes(payload))
    if payload and bytes(payload[:3]) == JPEG_MAGIC:
        return decode_jpeg(bytes(payload))
    if payload and bytes(payload[:6]) in GIF_MAGICS:
        return decode_gif(bytes(payload))
    return _fake_rgb_decode(payload, width, height)


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    decode_rgb: Callable[[bytes, int, int], "object"] | None = None,
) -> DataFrame:
    """Image resize over mapInPandas: decode each payload to an
    H×W×3 array (real PNG codec by default — sources/png.py — with
    a deterministic fake for formats whose codecs the container
    lacks), resize with REAL nearest-neighbor index math in numpy,
    emit the raw RGB bytes plus the new dims.  Output (id, width,
    height, rgb) — payload and meta are projected out so only
    out_w·out_h·3 bytes per row continue downstream.

    Rows without payload or meta dims, and payloads the codec
    rejects (truncated/corrupt — ValueError/zlib.error), are
    dropped (the reference skips undecodable sources and logs; the
    count difference is the metric)."""
    import zlib

    import numpy as np

    decode = decode_rgb or _default_rgb_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i, payload, meta in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    continue
                w, h = meta.get("width"), meta.get("height")
                if not w or not h:
                    continue
                try:
                    img = decode(bytes(payload), int(w), int(h))
                except (ValueError, zlib.error):
                    continue
                # nearest-neighbor: src index = floor((dst + 0.5) * src/dst)
                ys = np.minimum(
                    ((np.arange(out_h) + 0.5) * img.shape[0] / out_h).astype(int),
                    img.shape[0] - 1,
                )
                xs = np.minimum(
                    ((np.arange(out_w) + 0.5) * img.shape[1] / out_w).astype(int),
                    img.shape[1] - 1,
                )
                ids.append(i)
                blobs.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "rgb": blobs,
                }
            )

    return media.filter(media["kind"] == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
    ]
)


def audio_features(
    media: DataFrame,
    decode_audio: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Audio feature extraction over mapInPandas: decode each payload
    to a waveform (REAL PCM WAV codec by default — sources/wav.py,
    stdlib struct + one vectorized frombuffer; pass a
    librosa/soundfile decode_audio for compressed formats at
    deployment) and emit real signal features:
    (id, sample_rate, n_channels, duration_s, rms, peak,
    zero_crossing_rate) — all numpy-vectorized over the whole
    waveform, rounded to 6 dp for engine-portable determinism.

    Rows without payload and payloads the codec rejects
    (truncated/corrupt/non-PCM — ValueError) are dropped (the
    reference skips undecodable sources and logs; the count
    difference is the metric).  Payload is projected out after the
    UDF — only 7 scalars per row continue downstream."""
    import numpy as np

    from ferenda_spark.sources.wav import decode_wav

    decode = decode_audio or decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_FEATURES_SCHEMA}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    samples, rate = decode(bytes(payload))
                except ValueError:
                    continue
                frames = samples.shape[0]
                if frames == 0 or rate <= 0:
                    continue
                flat = samples.reshape(-1)
                signs = np.signbit(samples)
                zc = (
                    float(np.mean(signs[1:] != signs[:-1])) if frames > 1 else 0.0
                )
                out["id"].append(int(i))
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(samples.shape[1]))
                out["duration_s"].append(round(frames / rate, 6))
                out["rms"].append(round(float(np.sqrt(np.mean(flat * flat))), 6))
                out["peak"].append(round(float(np.max(np.abs(flat))), 6))
                out["zero_crossing_rate"].append(round(zc, 6))
            yield pd.DataFrame(out)

    return media.filter("kind = 'audio'").select("id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling *plan*: one output row per sampled
    timestamp, derived from meta.duration_ms — pure column ops
    (sequence + explode), with the actual frame grab left to the
    decode seam.  Output (id, frame_ts_ms).

    Videos with NULL or zero duration contribute NO rows (matching
    sample_frames, which drops undecodable/empty clips): greatest()
    skips NULLs, so without the filter a metadata-less video would
    emit a spurious frame_ts_ms=0 row and overstate the job size."""
    from pyspark.sql import functions as F

    return (
        media.filter(
            (F.col("kind") == "video") & (F.col("meta.duration_ms") > 0)
        )
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("rgb", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    decode_video: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """REAL video frame sampling: decode each video payload
    (dependency-free uncompressed-AVI codec by default —
    sources/avi.py; pass an ffmpeg-backed decode_video for
    compressed formats) and emit the frame nearest each sampled
    timestamp on the 0, every_ms, 2·every_ms, … grid, capped at the
    clip's actual duration.  Output (id, frame_ts_ms, width, height,
    rgb) — payload and meta are projected out so only the sampled
    frames' bytes continue downstream.

    Rows without payload and payloads the codec rejects
    (compressed / truncated / non-AVI — ValueError) are dropped,
    the same skip-and-count policy as resize_images.  The sampled
    timestamps reproduce frame_sample_plan's grid whenever
    meta.duration_ms matches the decoded n_frames·frame_ms, so the
    *plan* (pure column ops, no decode) remains the cheap way to
    size a sampling job before running this operator."""
    from pyspark.sql import functions as F

    from ferenda_spark.sources.avi import decode_avi

    decode = decode_video or decode_avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, tss, ws, hs, blobs = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    frames, frame_ms = decode(bytes(payload))
                except ValueError:
                    continue
                n = frames.shape[0]
                if n == 0 or frame_ms <= 0:
                    continue
                duration_ms = n * frame_ms
                grid = np.arange(0, duration_ms, every_ms)
                idx = np.minimum((grid / frame_ms).astype(int), n - 1)
                for ts, k in zip(grid, idx):
                    ids.append(i)
                    tss.append(int(ts))
                    ws.append(frames.shape[2])
                    hs.append(frames.shape[1])
                    blobs.append(frames[k].tobytes())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_ts_ms": tss,
                    "width": ws,
                    "height": hs,
                    "rgb": blobs,
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("id", "payload")
        .mapInPandas(run, schema=FRAMES_SCHEMA)
    )
