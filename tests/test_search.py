"""S7 fulltext search layer (fulltextindex.py:829-1013,
wsgiapp.py:500-526)."""

from datetime import date

from pyspark.sql import functions as F

from ferenda_spark.operators import search as SR

DOCS = [
    # (doc_id, text, lang, repo, issued, n_chars)
    (1, "the quick brown fox jumps", "en", "rfc", date(2013, 5, 1), 25),
    (2, "quick quick quick table", "en", "rfc", date(2014, 1, 1), 23),
    (3, "slow red table table quick", "en", "wiki", date(2012, 12, 31), 26),
    (4, "quick table", "sv", "rfc", date(2013, 7, 1), 11),
    (5, "nothing relevant here", "en", "rfc", date(2013, 2, 2), 21),
]
COLS = ["doc_id", "text", "lang", "repo", "issued", "n_chars"]


def _docs(spark):
    return spark.createDataFrame(DOCS, COLS)


def test_range_modifiers_exclusive(spark):
    docs = _docs(spark)
    got = {
        r["id"]
        for r in SR.search(
            docs, filters={"n_chars": SR.Between(11, 25)}, pagelen=10
        ).collect()
    }
    # exclusive bounds: 11 and 25 themselves are excluded
    assert got == {2, 5}
    got = {
        r["id"]
        for r in SR.search(docs, filters={"n_chars": SR.Less(23)}, pagelen=10).collect()
    }
    assert got == {4, 5}
    got = {
        r["id"]
        for r in SR.search(docs, filters={"n_chars": SR.More(25)}, pagelen=10).collect()
    }
    assert got == {3}


def test_year_modifier(spark):
    # year-issued=2013 -> Between(2012-12-31, 2014-01-01), both exclusive
    docs = _docs(spark)
    got = {
        r["id"]
        for r in SR.search(
            docs, filters={"issued": SR.year_modifier(2013)}, pagelen=10
        ).collect()
    }
    assert got == {1, 4, 5}  # excludes the 2012-12-31 and 2014-01-01 edges


def test_wildcard_and_term_filters(spark):
    docs = _docs(spark)
    got = {
        r["id"]
        for r in SR.search(
            docs, filters={"repo": "w*i", "lang": "en"}, pagelen=10
        ).collect()
    }
    assert got == {3}


def test_freetext_and_semantics_scoring_boost(spark):
    docs = _docs(spark)
    # AND: both 'quick' and 'table' must occur -> docs 2, 3, 4
    rows = SR.search(
        docs, q="quick table", boosts=[("wiki", 2.0)], boost_col="repo", pagelen=10
    ).collect()
    by_rank = [(r["id"], r["score"]) for r in sorted(rows, key=lambda r: r["rn"])]
    # doc2: 3+1=4; doc3: (1+2)*2=6; doc4: 1+1=2
    assert by_rank == [(3, 6.0), (2, 4.0), (4, 2.0)]


def test_pagination_slices(spark):
    docs = _docs(spark)
    page2 = SR.search(docs, q="quick", pagenum=2, pagelen=2).collect()
    assert [r["rn"] for r in sorted(page2, key=lambda r: r["rn"])] == [3, 4]


def test_search_docs_facet_pivot(spark):
    doc_rows = spark.createDataFrame(
        [("u:1", "Doc One"), ("u:2", "Doc Two")], ["doc_uri", "title"]
    )
    triples = spark.createDataFrame(
        [
            ("u:1", "p:issued", "2013-05"),
            ("u:1", "p:publisher", "org:a"),
            ("u:2", "p:issued", "2014-01"),
            ("u:1", "p:other", "x"),
        ],
        ["subj", "pred", "obj"],
    )
    sd = SR.search_docs(
        doc_rows, triples, {"issued": "p:issued", "publisher": "p:publisher"}
    )
    rows = {r["doc_uri"]: r for r in sd.collect()}
    assert rows["u:1"]["issued"] == "2013-05"
    assert rows["u:1"]["publisher"] == "org:a"
    assert rows["u:2"]["issued"] == "2014-01"
    assert rows["u:2"]["publisher"] is None
    assert set(sd.columns) == {"doc_uri", "title", "issued", "publisher"}
