"""C10 keyword/term aggregation.

Reference semantics (sources/general/keyword.py:107-230): collect a
term set from dcterms:subject triples — label = rdfs:label when
present else the URI leaf (the SPARQL OPTIONAL, keyword.py:116-123)
— sanitize each term (keyword.py:169-177: whitespace-normalized,
2 ≤ len ≤ 100, must not start with '.', '/' or ':' nor end with '.'
or ','), group to term → sorted subject URIs, then merge titlesets:
the mediawiki titleset ADDS terms (keyword.py:180-207, defaultdict
insert), while the wikipedia titleset only FLAGS terms already
present (keyword.py:212-230 "only register those terms that have
already been featured in another termset") — a full-outer join
followed by a flagging left join.

Spark-first: the per-term Python dict loop becomes one aggregation;
titleset membership becomes joins on the sanitized term key.  The
term table is dimension-sized next to the triples scan, so AQE
broadcasts the titleset sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERM_MIN_LEN = 2
TERM_MAX_LEN = 100
INVALID_TERM_START = (".", "/", ":")
INVALID_TERM_END = (".", ",")


def sanitize_term(col):
    """keyword.py:169-177 sanitize_term as a column expression:
    normalize_space then the length / first-char / last-char rules;
    NULL for invalid terms (the reference returns None)."""
    t = F.regexp_replace(F.trim(col), r"\s+", " ")
    ok = (
        (F.length(t) >= TERM_MIN_LEN)
        & (F.length(t) <= TERM_MAX_LEN)
        & ~F.substring(t, 1, 1).isin(*INVALID_TERM_START)
        & ~t.substr(F.length(t), F.lit(1)).isin(*INVALID_TERM_END)
    )
    return F.when(ok, t)


def uri_leaf(col):
    """util.uri_leaf / basefile_from_uri fallback (keyword.py:119)."""
    return F.regexp_extract(col, r"([^/#]+)[/#]?$", 1)


def keyword_terms(
    triples: DataFrame,
    subject_pred: str,
    label_pred: str,
    mediawiki_titles: DataFrame | None = None,
    wikipedia_titles: DataFrame | None = None,
) -> DataFrame:
    """triples → (term, n_refs, first_subject, in_mediawiki,
    in_wikipedia).

    n_refs counts distinct referring docs; first_subject is the
    lexicographic min referring URI (the deterministic stand-in for
    the reference's sorted subject list, keyword.py:155-157).
    `mediawiki_titles`/`wikipedia_titles` are one-column ("title")
    DataFrames."""
    refs = triples.filter(F.col("pred") == subject_pred).select(
        F.col("subj").alias("doc"), F.col("obj").alias("subject")
    )
    labels = triples.filter(F.col("pred") == label_pred).select(
        F.col("subj").alias("subject"), F.col("obj").alias("label")
    )
    raw = F.coalesce(F.col("label"), uri_leaf(F.col("subject")))
    base = (
        refs.join(labels, "subject", "left")
        .select(sanitize_term(raw).alias("term"), "doc")
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(
            F.countDistinct("doc").cast("long").alias("n_refs"),
            F.min("doc").alias("first_subject"),
        )
    )

    if mediawiki_titles is not None:
        mw = (
            mediawiki_titles.select(sanitize_term(F.col("title")).alias("term"))
            .filter(F.col("term").isNotNull())
            .distinct()
            .withColumn("_mw", F.lit(True))
        )
        base = base.join(mw, "term", "full_outer").select(
            "term",
            F.coalesce("n_refs", F.lit(0)).cast("long").alias("n_refs"),
            "first_subject",
            F.coalesce("_mw", F.lit(False)).alias("in_mediawiki"),
        )
    else:
        base = base.withColumn("in_mediawiki", F.lit(False))

    if wikipedia_titles is not None:
        wp = (
            wikipedia_titles.select(sanitize_term(F.col("title")).alias("term"))
            .filter(F.col("term").isNotNull())
            .distinct()
            .withColumn("_wp", F.lit(True))
        )
        # flags only — runs last, never adds terms (keyword.py:222-228)
        base = base.join(wp, "term", "left").select(
            "term",
            "n_refs",
            "first_subject",
            "in_mediawiki",
            F.coalesce("_wp", F.lit(False)).alias("in_wikipedia"),
        )
    else:
        base = base.withColumn("in_wikipedia", F.lit(False))
    return base
