"""One adversarial corpus through the whole training-data operator
family: NULL text, empty strings, pure whitespace, control bytes,
unicode-heavy rows, NULL/garbage urls.  Every operator must return
(no crash, no NULL-poisoned explosion) — the verify-skill probe set
("malformed/empty/None ... operators must not crash") as a permanent
test.
"""

from __future__ import annotations

import pytest

from ferenda_spark.operators import curation, dedup, textstats

ROWS = [
    (0, "https://a.example.com/x", None),
    (1, "https://a.example.com/y", ""),
    (2, "https://b.example.com/", "   \n\n\t  "),
    (3, None, "\x00\x01\x02 control bytes \x1f"),
    (4, "not a url at all", "word " * 500),
    (5, "https://c.example.com/p?b=2&a=1#frag", "naïve café 統一碼 🎈 done"),
    (6, "HTTPS://C.EXAMPLE.COM:443/p/", "the same line\nthe same line\nthe same line"),
    (7, "https://d.example.com/q", "one two three four five six seven"),
]
SCHEMA = "id long, url string, text string"


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_textstats_family_survives(nasty):
    n = len(ROWS)
    assert textstats.token_count(nasty, "text", "id").count() == n
    assert textstats.lang_id(nasty, "text", "id").count() == n
    assert textstats.quality_score(nasty, "text", "id").count() == n
    assert textstats.fingerprint(nasty, "text", "id").count() == n


def test_curation_family_survives(nasty):
    n = len(ROWS)
    assert curation.repetition_signals(nasty, "text", "id").count() == n
    assert curation.pii_scan(nasty, "text", "id").count() == n
    assert curation.normalize_urls(nasty, "url").count() == n
    assert curation.normalize_unicode(nasty, "text").count() == n
    assert curation.fix_mojibake(nasty, "text").count() == n
    # cleaning may drop rows but must not crash or invent ids
    cleaned = curation.clean_lines(nasty, "text", "id")
    assert cleaned.count() <= n
    assert curation.sequence_pack_plan(nasty, "text", "id").count() >= 0
    withhost = nasty.fillna({"url": ""}).selectExpr(
        "id", "coalesce(parse_url(url, 'HOST'), '') AS host"
    )
    assert curation.host_split(withhost, "host", "id").count() == n


def test_dedup_family_survives(nasty):
    n = len(ROWS)
    assert dedup.exact_dedup_groups(nasty, "text", "id").count() <= n
    # a NULL text has no tokens, hence no signature row — textless
    # docs simply don't participate in similarity dedup
    sigs = dedup.simhash(nasty, "text", "id")
    assert sigs.count() == n - 1
    assert sigs.filter("simhash IS NULL").count() == 0


def test_similarity_survives_zero_and_nan_vectors(spark):
    """One all-zeros or NaN embedding must neither crash the job
    (ANSI DIVIDE_BY_ZERO) nor win a top-k slot (NaN sorts above
    every real score in a descending Spark window)."""
    from pyspark.sql import functions as F

    from ferenda_spark.operators import similarity as S

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
        (4, [float("nan"), 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(rows[1:2], "vec_id long, embedding array<double>")
    top = S.brute_force_topk(df, q, k=3).collect()
    assert top and all(r["neighbor_id"] not in (0, 4) for r in top)
    pairs = {(r[0], r[1]) for r in S.threshold_pairs_blocked(df, 0.5).collect()}
    assert pairs == {(1, 3), (2, 3)}
    cos = (
        df.crossJoin(q.selectExpr("embedding AS qv"))
        .select("vec_id", S.cosine(F.col("embedding"), F.col("qv")).alias("c"))
        .collect()
    )
    byid = {r["vec_id"]: r["c"] for r in cos}
    assert byid[0] is None and byid[1] == 1.0  # zero-norm -> NULL, not error


def test_scan_text_linear_on_mention_farms():
    """A page made of 20k citations scans in well under a second —
    the claimed-span check is O(M log M), not the O(M²) that would
    wedge an executor on real link-farm pages."""
    import time

    from ferenda_spark.functions.patterns import scan_text

    text = "Section 1.2 " * 20_000
    t0 = time.time()
    got = scan_text(text)
    elapsed = time.time() - t0
    assert len(got) == 20_000
    assert elapsed < 2.0, f"quadratic masking regression: {elapsed:.1f}s"


def test_empty_inputs_everywhere(spark):
    """Empty tables are answers, not errors: the full KG build, the
    training ops, both similarity paths (either side empty), and a
    SPARQL query over an empty store all return empty results."""
    from ferenda_spark import PipelineConfig
    from ferenda_spark.operators import similarity as S
    from ferenda_spark.operators.sparql import run_sparql
    from ferenda_spark.pipeline import build_kg

    pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    assert build_kg(spark, pages, PipelineConfig()).triples.count() == 0

    docs = spark.createDataFrame([], "id long, url string, text string")
    assert textstats.token_count(docs, "text", "id").count() == 0
    assert curation.sequence_pack_plan(docs, "text", "id").count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert S.brute_force_topk(emb, q, k=3).count() == 0
    assert S.brute_force_topk(q, emb, k=3).count() == 0  # empty probes
    assert S.threshold_pairs_blocked(emb, 0.5).count() == 0

    t = spark.createDataFrame(
        [], "subj string, pred string, obj string, obj_is_uri boolean, "
            "lang string, datatype string"
    )
    assert run_sparql(
        t, "SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { ?s <q> ?x . } }"
    ).count() == 0
