"""Query-layer operators (SURVEY.md §2.5-2.8): semantics on small
hand-built frames; full value parity vs DuckDB runs in
tools/selfcheck.py and the driver gate."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import query as Q


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "Alpha One", "click"),
            (2, "alpha two", "view"),
            (3, "Beta", "click"),
            (4, "--", "view"),
            (5, "beta again", "click"),
        ],
        ["id", "name", "etype"],
    )


def test_facet_pivot(people):
    rows = {r["id"]: r for r in Q.facet_pivot(people, "id", "etype", ["click", "view"]).collect()}
    assert rows[1]["click"] == 1 and rows[1]["view"] == 0
    assert rows[4]["view"] == 1


def test_toc_pagesets_and_pages(people):
    ps = {r.letter: r.n_items for r in Q.toc_pagesets(people, "name").collect()}
    assert ps == {"a": 2, "b": 2, "-": 1}
    pages = Q.toc_select_for_pages(people, "name", "id", per_page=1).collect()
    by_letter = {r.letter: r.title for r in pages}
    assert by_letter["a"] == "Alpha One"  # sortkey order
    assert by_letter["b"] == "Beta"


def test_title_sortkey_reference_semantics(spark):
    """util.title_sortkey parity (util.py:724-737): leading 'the '
    stripped, \\W+ removal is Unicode-aware (ö survives, '_' kept)."""
    df = spark.createDataFrame(
        [("The 'viewstate' property",), ("Öga för öga",), ("a_b c!",), ("---",)],
        ["t"],
    )
    got = [r.k for r in df.select(Q.title_sortkey(F.col("t")).alias("k")).collect()]
    assert got == ["viewstateproperty", "ögaföröga", "a_bc", ""]
    letters = [r.l for r in df.select(Q.firstletter(F.col("t")).alias("l")).collect()]
    assert letters == ["v", "ö", "a", "-"]


def test_stats_slices(people):
    s = {r.observation: r.n for r in Q.stats_slices(people, "etype", "id").collect()}
    assert s == {"click": 3, "view": 2}


def test_citation_topk_with_canon(spark):
    edges = spark.createDataFrame(
        [("d1", "X"), ("d2", "X"), ("d3", "Xalt"), ("d4", "Y")], ["src", "dst"]
    )
    canon = spark.createDataFrame([("Xalt", "X")], ["uri", "canon_uri"])
    top = Q.citation_topk(edges, "dst", k=2, canon=canon).collect()
    assert [(r.target, r.n_citing) for r in top] == [("X", 3), ("Y", 1)]


def test_degree_histogram(spark):
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y"), ("d", "z")], ["src", "dst"]
    )
    h = {r.degree: r.n_nodes for r in Q.degree_histogram(edges, "dst").collect()}
    assert h == {2: 1, 1: 2}


def test_pagerank_distribution(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    ranks = {r.node: r["rank"] for r in Q.pagerank(edges, iterations=20, checkpoint_every=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # probability distribution
    assert ranks["a"] > ranks["d"]  # 'd' has no inbound


def test_paginate_and_windows(spark):
    df = spark.createDataFrame([(i,) for i in range(25)], ["v"])
    page2 = Q.paginate(df, [F.asc("v")], pagenum=2, pagelen=10).collect()
    assert [r.v for r in page2] == list(range(10, 20))
    win = {r.archive_page: r.n_entries for r in Q.feed_archive_windows(df, [F.asc("v")], 10).collect()}
    assert win == {0: 10, 1: 10, 2: 5}


def test_composite_union_dedup(spark):
    a = spark.createDataFrame([("k1", "A", 1), ("k2", "A", 1)], ["key", "src", "source_priority"])
    b = spark.createDataFrame([("k1", "B", 2), ("k3", "B", 2)], ["key", "src", "source_priority"])
    rows = {r.key: r.src for r in Q.composite_union_dedup([a, b], "key").collect()}
    assert rows == {"k1": "A", "k2": "A", "k3": "B"}  # first source wins


def test_round_portable(spark):
    df = spark.createDataFrame([(0.8176465,), (1.0,), (0.1234564,)], ["x"])
    vals = [r.r for r in df.select(Q.round_portable(F.col("x"), 6).alias("r")).collect()]
    assert vals[1] == 1.0
    assert abs(vals[2] - 0.123456) < 1e-12


def test_bucketed_join_elides_shuffle(spark, tmp_path_factory):
    """write_bucketed_table co-location: an equi-join between two
    tables bucketed the same way on the join key runs WITHOUT a
    shuffle on either side (no Exchange hashpartitioning in the
    plan), while the identical unbucketed join shuffles both."""
    import io
    from contextlib import redirect_stdout

    from ferenda_spark.sources.pages import write_bucketed_table

    base = tmp_path_factory.mktemp("bucketed")
    triples = spark.range(0, 2000).select(
        F.concat(F.lit("s"), (F.col("id") % 200)).alias("subj"),
        F.col("id").alias("n"),
    )
    directory = spark.range(0, 200).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    write_bucketed_table(triples, "t_b", "subj", 8, path=str(base / "t"))
    write_bucketed_table(directory, "d_b", "subj", 8, path=str(base / "d"))

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = spark.table("t_b").join(spark.table("d_b"), "subj")
        p = plan_of(bucketed)
        assert "Exchange" not in p, p
        # contrast: same data unbucketed shuffles both sides
        plain = triples.join(directory, "subj")
        assert plan_of(plain).count("Exchange") >= 2
        # and the shuffle-free plan is still CORRECT
        got = {(r["subj"], r["n"], r["url"]) for r in bucketed.collect()}
        want = {(r["subj"], r["n"], r["url"]) for r in plain.collect()}
        assert got == want and len(got) == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_b")
        spark.sql("DROP TABLE IF EXISTS d_b")
