"""BGP/CONSTRUCT compiler (graphquery) — the reference's SPARQL
SELECT/CONSTRUCT surface (devel.py:1098,1119) over the distributed
triples table."""

import pyspark.sql.functions as F
import pytest

from ferenda_spark.operators.graphquery import bgp, construct

SCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "lang string, datatype string"
)

#: a tiny citation graph: two docs with publishers, one section
#: each, cross-references both ways, one title with a lang tag and
#: one typed date
ROWS = [
    ("d1", "type", "Doc", True, None, None),
    ("d2", "type", "Doc", True, None, None),
    ("d1", "title", "Alpha", False, "en", None),
    ("d2", "title", "Beta", False, "sv", None),
    ("d1", "issued", "2004-01", False, None, "xsd:gYearMonth"),
    ("d2", "issued", "1999-06", False, None, "xsd:gYearMonth"),
    ("d1", "publisher", "org1", True, None, None),
    ("d1#s1", "partOf", "d1", True, None, None),
    ("d2#s1", "partOf", "d2", True, None, None),
    ("d1#s1", "references", "d2", True, None, None),
    ("d2#s1", "references", "d1", True, None, None),
    ("d1#s1", "title", "Intro", False, "en", None),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_single_pattern_constants_push(g):
    got = bgp(g, [("?s", "type", "Doc")], select=["s"])
    assert {r["s"] for r in got.collect()} == {"d1", "d2"}


def test_join_on_shared_variable(g):
    # sections referencing a doc that has a publisher
    got = bgp(
        g,
        [("?sec", "references", "?doc"), ("?doc", "publisher", "?pub")],
        select=["sec", "doc", "pub"],
    ).collect()
    assert [tuple(r) for r in got] == [("d2#s1", "d1", "org1")]


def test_optional_left_join(g):
    got = {
        (r["doc"], r["pub"])
        for r in bgp(
            g,
            [("?doc", "type", "Doc")],
            optionals=[[("?doc", "publisher", "?pub")]],
            select=["doc", "pub"],
        ).collect()
    }
    assert got == {("d1", "org1"), ("d2", None)}


def test_filter_expression(g):
    got = bgp(
        g,
        [("?doc", "issued", "?issued")],
        filters=["issued >= '2000'"],
        select=["doc"],
    ).collect()
    assert [r["doc"] for r in got] == ["d1"]


def test_ground_pattern_existence(g):
    # fully-ground pattern acts as an EXISTS gate
    assert bgp(g, [("d1", "publisher", "org1"), ("?s", "type", "Doc")],
               select=["s"]).count() == 2
    assert bgp(g, [("d2", "publisher", "org1"), ("?s", "type", "Doc")],
               select=["s"]).count() == 0


def test_variable_predicate(g):
    got = bgp(g, [("d1", "?p", "?o")], select=["p", "o"])
    assert ("title", "Alpha") in {(r["p"], r["o"]) for r in got.collect()}


def test_construct_propagates_term_metadata(g):
    out = construct(
        g,
        [("?sec", "references", "?doc"), ("?doc", "title", "?t")],
        [
            ("?sec", "cites", "?doc", True),
            ("?sec", "citesTitle", "?t", None),  # None -> matched metadata
        ],
    )
    rows = {tuple(r) for r in out.collect()}
    assert ("d2#s1", "cites", "d1", True, None, None) in rows
    assert ("d2#s1", "citesTitle", "Alpha", False, "en", None) in rows
    assert ("d1#s1", "citesTitle", "Beta", False, "sv", None) in rows


def test_construct_feeds_ntriples(g):
    from ferenda_spark.operators.rdfio import to_ntriples

    out = construct(
        g,
        [("?doc", "issued", "?d")],
        [("?doc", "hasDate", "?d", None)],
    )
    lines = {r["line"] for r in to_ntriples(out).collect()}
    assert '<d1> <hasDate> "2004-01"^^<xsd:gYearMonth> .' in lines


def test_plan_is_jvm_only_with_pushed_filters(g):
    q = bgp(
        g,
        [("?sec", "references", "?doc"), ("?doc", "publisher", "?pub")],
        select=["sec", "doc", "pub"],
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_kg_bgp_matches_duckdb_oracle(spark):
    import duckdb

    from ferenda_spark.queries import _oracle_kg_bgp, q_kg_bgp

    cols = ["sec", "doc", "pub", "title", "issued", "sectitle"]
    got = sorted(tuple(r) for r in q_kg_bgp(spark, None).select(*cols).collect())
    want = sorted(tuple(r) for r in duckdb.sql(_oracle_kg_bgp()).fetchall())
    assert got == want
    assert len(got) > 100


def test_property_path_bounded_hops(spark):
    from ferenda_spark.operators.graphquery import property_path

    # chain a -> b -> c -> d -> e under pred "in"
    rows = [(x, "in", y, True, None, None)
            for x, y in [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]]
    t = spark.createDataFrame(rows, SCHEMA)
    got = {(r["src"], r["dst"]) for r in property_path(t, "in", 1, 3).collect()}
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),        # 1 hop
        ("a", "c"), ("b", "d"), ("c", "e"),                    # 2 hops
        ("a", "d"), ("b", "e"),                                # 3 hops
    }
    # min_hops=2 drops the direct edges
    two_plus = {(r["src"], r["dst"]) for r in property_path(t, "in", 2, 3).collect()}
    assert two_plus == {("a", "c"), ("b", "d"), ("c", "e"), ("a", "d"), ("b", "e")}


def test_path_pattern_in_bgp(g):
    # sections reach their doc (and only that) via partOf+; join
    # the ancestor's title through a shared variable
    got = bgp(
        g,
        [("?part", "partOf+", "?anc"), ("?anc", "title", "?t")],
        select=["part", "anc", "t"],
    ).collect()
    assert {(r["part"], r["anc"], r["t"]) for r in got} == {
        ("d1#s1", "d1", "Alpha"),
        ("d2#s1", "d2", "Beta"),
    }


def test_kg_paths_matches_duckdb_oracle(spark):
    import duckdb

    from ferenda_spark.queries import _oracle_kg_paths, q_kg_paths

    got = sorted(tuple(r) for r in q_kg_paths(spark, None).collect())
    want = sorted(tuple(r) for r in duckdb.sql(_oracle_kg_paths()).fetchall())
    assert got == want
    assert len(got) > 1000


def test_pred_stats_and_cost_ordering(g):
    """pred_stats counts the store; _order_patterns breaks equal-shape
    ties by estimated cardinality (rarest predicate first), and the
    ordering never changes RESULTS — only the join order."""
    from ferenda_spark.operators.graphquery import (
        _order_patterns,
        pred_stats,
        use_stats,
    )

    stats = pred_stats(g)
    assert stats["title"] == 3 and stats["publisher"] == 1

    # two 2-var patterns: without stats, lexical order puts partOf
    # first; with stats, publisher (1 row) beats partOf (2 rows)
    pats = [("?a", "partOf", "?b"), ("?a", "publisher", "?c")]
    assert _order_patterns(list(pats))[0][1] == "partOf"
    assert _order_patterns(list(pats), stats)[0][1] == "publisher"
    # path quantifiers estimate via their base predicate
    pq = [("?a", "partOf+", "?b"), ("?a", "publisher", "?c")]
    assert _order_patterns(list(pq), stats)[0][1] == "publisher"

    # results are identical with and without stats (explicit and
    # ambient via use_stats)
    pats3 = [
        ("?sec", "references", "?doc"),
        ("?doc", "publisher", "?pub"),
        ("?doc", "title", "?t"),
    ]
    want = {("d2#s1", "d1", "org1", "Alpha")}
    sel = ["sec", "doc", "pub", "t"]
    assert {tuple(r) for r in bgp(g, pats3, select=sel).collect()} == want
    assert {
        tuple(r) for r in bgp(g, pats3, select=sel, stats=stats).collect()
    } == want
    with use_stats(stats):
        assert {tuple(r) for r in bgp(g, pats3, select=sel).collect()} == want


def test_run_sparql_with_stats(g):
    """run_sparql(stats=...) scopes stats over the whole compile and
    returns the same solutions as the statless compile."""
    from ferenda_spark.operators.graphquery import pred_stats
    from ferenda_spark.operators.sparql import run_sparql

    q = """
    SELECT ?sec ?pub WHERE {
      ?sec <references> ?doc .
      ?doc <publisher> ?pub .
    }
    """
    base = {tuple(r) for r in run_sparql(g, q).collect()}
    got = {tuple(r) for r in run_sparql(g, q, stats=pred_stats(g)).collect()}
    assert got == base == {("d2#s1", "org1")}
