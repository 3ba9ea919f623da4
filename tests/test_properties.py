"""Property-based tests (hypothesis) over the pure-Python kernels —
the pieces whose correctness the Spark operators inherit: the patch
applier, the three media codecs, the wildcard rewrite, and the FSM
segmenter.  No SparkSession needed; each property runs in
milliseconds per example.

Each property checks against an INDEPENDENT model (difflib for
patches, a split-segments matcher for wildcards, identity for codec
round trips), not against the implementation's own logic.
"""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.functions.fsm import segment_document
from ferenda_spark.functions.scalars import wildcard_to_rlike
from ferenda_spark.operators.patch import apply_unified_diff
from ferenda_spark.sources.avi import decode_avi, encode_avi
from ferenda_spark.sources.png import decode_png, encode_png
from ferenda_spark.sources.wav import decode_wav, encode_wav

# text lines without newlines (diff bodies are line-oriented); no
# leading backslash (reserved for '\\ No newline' markers)
_line = st.text(
    alphabet=st.characters(blacklist_characters="\n\r\\"), max_size=20
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_line, max_size=15), st.lists(_line, max_size=15))
def test_patch_roundtrip_any_edit(a, b):
    """difflib.unified_diff(a→b) applied to a reproduces b exactly,
    for ANY pair of line lists — inserts at either end, full
    deletions, empty sources, empty targets."""
    import difflib

    src, dst = "\n".join(a), "\n".join(b)
    diff = "\n".join(
        difflib.unified_diff(
            src.split("\n"), dst.split("\n"), lineterm="", n=1
        )
    )
    assert apply_unified_diff(src, diff) == dst


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_every_filter(h, w, filter_type, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    np.testing.assert_array_equal(out, img)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 3),
    st.sampled_from([8, 16]),
    st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_on_grid(frames, channels, bits, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    scale = 128.0 if bits == 8 else 32768.0
    # quantization-grid values in [-1, 1): survive encode→decode
    raw = rng.integers(-int(scale), int(scale), size=(frames, channels))
    samples = raw / scale
    out, rate = decode_wav(encode_wav(samples, 8000, bits=bits))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 4),
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
)
def test_avi_roundtrip_any_geometry(n, h, w, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    out, frame_ms = decode_avi(encode_avi(frames, fps=20.0))
    assert frame_ms == 50.0
    np.testing.assert_array_equal(out, frames)


def _wildcard_matches(pattern: str, s: str) -> bool:
    """Independent model of the reference's '*'-only wildcard
    (fulltextindex.py:848-853): split on '*', require the literal
    segments to appear in order, anchored at both ends."""
    parts = pattern.split("*")
    if len(parts) == 1:
        return s == pattern
    if not s.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for seg in parts[1:-1]:
        i = s.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = parts[-1]
    return len(s) - pos >= len(last) and s.endswith(last)


_wc_alpha = st.text(alphabet=list("ab.#*"), max_size=8)


@settings(max_examples=200, deadline=None)
@given(_wc_alpha, st.text(alphabet=list("ab.#"), max_size=10))
def test_wildcard_rewrite_matches_model(pattern, s):
    """The regex wildcard_to_rlike emits agrees with the
    split-segments model on every (pattern, string) pair — including
    regex metacharacters ('.', '#') appearing literally."""
    got = re.fullmatch(wildcard_to_rlike(pattern), s) is not None
    assert got == _wildcard_matches(pattern, s)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_segment_document_total_and_faithful(text):
    """The FSM segmenter accepts ANY unicode text without raising;
    emitted sections carry the documented keys, their positions are
    0..n-1 in order, and every non-empty body/title string is built
    from verbatim lines of the input."""
    meta, sections = segment_document(text)
    assert isinstance(meta, dict)
    assert [s["pos"] for s in sections] == list(range(len(sections)))
    for s in sections:
        assert {"ordinal", "parent", "title", "text", "pos"} <= set(s)
        # section bodies are stripped runs of input lines: every
        # body line is a verbatim input line
        for ln in s["text"].split("\n"):
            if ln:
                assert ln in text


def test_segment_document_not_vacuous():
    """The property above must exercise real sections: the synthetic
    corpus' first doc segments into >= 2 ordered sections."""
    from ferenda_spark.config import PipelineConfig
    from ferenda_spark.datagen import pages_rows
    from ferenda_spark.operators.extract import extract_one

    row = next(iter(pages_rows(42, 0, 1, 1, PipelineConfig())))
    text = extract_one(row["html"])[0]  # (extracted_text, title, lang)
    meta, sections = segment_document(text)
    assert len(sections) >= 2
    assert sections[0]["ordinal"]
    assert meta.get("docid") or meta.get("title")
