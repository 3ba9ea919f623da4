"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Reference touchpoints: ferenda detects doc language per document
(documentrepository.py:1343 lang literal), counts words during
fulltext indexing (:2157-2167), and normalizes whitespace (P3).
These operators generalize that to corpus-curation primitives, all
expressed as built-in column expressions (JVM-side, codegen'd — no
Python in the hot path), so they compose with any scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.dedup import normalize_text
from ferenda_spark.operators.query import round_portable

#: Tiny per-language marker lexicons (n-gram/stopword heuristic).
#: Deliberately small and deterministic — the operator contract is
#: the scoring rule, not lexicon quality; swap in real lexicons at
#: deployment.  Order fixes argmax tie-breaking.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to", "in", "is"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht"]),
    ("fr", ["le", "la", "les", "et", "est", "une"]),
    ("es", ["el", "los", "las", "es", "una", "que"]),
    ("sv", ["och", "att", "det", "som", "en", "av"]),
]


def _tokens(text_col):
    return F.split(normalize_text(text_col), " ")


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_word_tokens): whitespace tokens and
    BPE-ish word tokens ([a-z0-9]+ runs after lowercasing)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0))
        .cast("long")
        .alias("n_word_tokens"),
    )


def _marker_hits(toks, markers: list[str]):
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-lexicon language ID: predicted = argmax over languages
    of marker-token count; 'und' when no marker hits.  Ties go to
    LANG_MARKERS order.  Output (id, predicted_lang, marker_hits)."""
    toks = _tokens(F.col(text_col))
    scored = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    hits = {lang: _marker_hits(F.col("toks"), m) for lang, m in LANG_MARKERS}
    max_n = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):  # earliest lang wins ties
        pred = F.when(hits[lang] == max_n, F.lit(lang)).otherwise(pred)
    pred = F.when(max_n == 0, F.lit("und")).otherwise(pred)
    return scored.select(
        "id", pred.alias("predicted_lang"), max_n.cast("long").alias("marker_hits")
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score (Gopher/C4-style
    rules, public literature):
      n_tokens, mean_token_len, alpha_ratio (alphabetic chars /
      non-space chars), stopword_ratio (english markers / tokens),
      score = clamped blend — rounded to 6 dp so the value is
      engine-portable.  Output one row per doc."""
    t = normalize_text(F.col(text_col))
    toks = F.split(t, " ")
    n = F.size(toks)
    nonspace = F.length(F.regexp_replace(t, " ", ""))
    alpha = F.length(F.regexp_replace(t, "[^a-z]", ""))
    stop = _marker_hits(toks, LANG_MARKERS[0][1])
    mean_len = round_portable(nonspace.cast("double") / n, 6)
    alpha_ratio = round_portable(
        alpha.cast("double") / F.greatest(nonspace, F.lit(1)), 6
    )
    stop_ratio = round_portable(stop.cast("double") / n, 6)
    length_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = round_portable(
        0.4 * alpha_ratio + 0.3 * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + 0.3 * length_ok,
        6,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 4) -> DataFrame:
    """Document fingerprint: full-content md5 plus a winnowing-style
    min-shingle fingerprint (lexicographic min of md5 over k-token
    shingles — robust to local edits).  Output
    (id, content_md5, min_shingle_fp)."""
    t = normalize_text(F.col(text_col))
    toks = F.split(t, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(t).alias("content_md5"),
        F.array_min(sh).alias("min_shingle_fp"),
    )
