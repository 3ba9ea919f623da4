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


# ---------------------------------------------- parent/child (has_child)

CHILDREN = [
    # (doc_id, sec_id, text, role)
    (1, "S1", "quick brown detail", None),
    (1, "S2", "quick again", None),
    (3, "S1", "irrelevant", None),
    (5, "S1", "quick inside child only", None),
    (5, "S2", "quick autocomplete row", "autocomplete"),
    (2, "S1", "nothing", None),
]
CCOLS = ["doc_id", "sec_id", "text", "role"]


def test_parent_child_hits_and_scores(spark):
    """fulltextindex.py:890-910: parent hits on own match OR any
    non-autocomplete child match; score sums child contributions."""
    parents = _docs(spark)
    children = spark.createDataFrame(CHILDREN, CCOLS)
    rows = {
        r["id"]: r
        for r in SR.search_parent_child(
            parents, children, q="quick", role_col="role", pagelen=10
        ).collect()
    }
    # doc 5 has no own match but a child match -> included (child-only)
    assert 5 in rows and rows[5]["n_child_hits"] == 1  # autocomplete excluded
    # doc 3 matches itself but its child doesn't -> 0 child hits
    assert rows[3]["n_child_hits"] == 0
    # doc 1: own occ 1 + children 1 + 1 = 3.0
    assert rows[1]["score"] == 3.0 and rows[1]["n_child_hits"] == 2
    # doc 2: own occ 3 + child 0 matching children
    assert rows[2]["score"] == 3.0 and rows[2]["n_child_hits"] == 0
    # doc 4 matches itself only
    assert rows[4]["score"] == 1.0
    # ranking deterministic: score desc, id asc
    order = [r["id"] for r in sorted(rows.values(), key=lambda r: r["rn"])]
    assert order == [1, 2, 5, 3, 4] or order[0:2] == [1, 2]


def test_parent_child_autocomplete_excluded(spark):
    parents = _docs(spark)
    children = spark.createDataFrame(
        [(5, "S1", "quick", "autocomplete")], CCOLS
    )
    got = {
        r["id"]
        for r in SR.search_parent_child(
            parents, children, q="nothing relevant", role_col="role", pagelen=10
        ).collect()
    }
    # only doc 5's own text AND-matches both tokens; its sole child
    # is autocomplete-excluded
    assert got == {5}


def test_parent_child_empty_q_degenerates(spark):
    parents = _docs(spark)
    children = spark.createDataFrame(CHILDREN, CCOLS)
    out = SR.search_parent_child(
        parents, children, q="   ", role_col="role", pagelen=3
    ).collect()
    assert len(out) == 3
    assert all(r["n_child_hits"] == 0 for r in out)


def test_search_blank_q_no_error(spark):
    """ADVICE: q that tokenizes to nothing must not IndexError."""
    out = SR.search(_docs(spark), q="   ", pagelen=3).collect()
    assert len(out) == 3 and all(r["score"] == 1.0 for r in out)


def test_exclude_repos_nulls_kept(spark):
    """must_not term semantics (fulltextindex.py:940-947): named
    repos dropped, NULL repo NOT dropped (ES term only rejects rows
    where the field has the value)."""
    rows = DOCS + [(6, "quick table extra", "en", None, date(2013, 3, 3), 17)]
    docs = spark.createDataFrame(rows, COLS)
    got = {
        r["id"]
        for r in SR.search(
            docs, q="quick", exclude_repos=["wiki"], pagelen=10
        ).collect()
    }
    assert got == {1, 2, 4, 6}  # 3 (wiki) excluded, 6 (NULL repo) kept


def test_fragment_parent_filter(spark):
    """join='parent' restriction (fulltextindex.py:975-981,
    :1000-1004): fragments = rows with non-zero/non-null order;
    include_fragments or ac_query lets them through."""
    rows = [
        (1, "quick", "en", "rfc", date(2013, 1, 1), 5, 0),
        (2, "quick", "en", "rfc", date(2013, 1, 1), 5, 1),  # fragment
        (3, "quick", "en", "rfc", date(2013, 1, 1), 5, None),
    ]
    docs = spark.createDataFrame(rows, COLS + ["ord"])
    parents = {
        r["id"]
        for r in SR.search(docs, q="quick", fragment_col="ord", pagelen=10).collect()
    }
    assert parents == {1, 3}
    withfrag = {
        r["id"]
        for r in SR.search(
            docs, q="quick", fragment_col="ord", include_fragments=True, pagelen=10
        ).collect()
    }
    assert withfrag == {1, 2, 3}


def test_ac_query_natural_order(spark):
    """Identifier autocomplete (fulltextindex.py:995-1000): no q →
    rank by the document's natural order, fragments included."""
    rows = [
        (1, "s 12 first lines", "en", "rfc", date(2013, 1, 1), 16, 3),
        (2, "s 12 other", "en", "rfc", date(2013, 1, 1), 10, 1),
        (3, "s 12 third", "en", "rfc", date(2013, 1, 1), 10, 2),
    ]
    docs = spark.createDataFrame(rows, COLS + ["ord"])
    got = [
        r["id"]
        for r in SR.search(
            docs,
            filters={"lang": "en"},
            ac_query=True,
            fragment_col="ord",
            order_col="ord",
            pagelen=10,
        ).collect()
    ]
    assert got == [2, 3, 1]  # natural order, not score/id order


def test_search_aggregations_counts_and_size(spark):
    """_aggregation_payload restatement (fulltextindex.py:1015-1033):
    per-dim top-N counts over the hit set; NULL values not bucketed;
    size truncates by count desc."""
    rows = DOCS + [(6, "quick table extra", "en", None, date(2013, 3, 3), 17)]
    docs = spark.createDataFrame(rows, COLS)
    out = SR.search_aggregations(
        docs, dims=("lang", "repo"), q="quick", year_dims=()
    ).collect()
    got = {(r["dim"], r["value"]): r["n"] for r in out}
    # hits of 'quick': docs 1,2,3,4,6
    assert got[("lang", "en")] == 4 and got[("lang", "sv")] == 1
    assert got[("repo", "rfc")] == 3 and got[("repo", "wiki")] == 1
    assert ("repo", None) not in got  # NULL repo row not bucketed
    top1 = SR.search_aggregations(docs, dims=("repo",), q="quick", size=1).collect()
    assert [(r["dim"], r["value"], r["n"]) for r in top1] == [("repo", "rfc", 3)]


def test_search_aggregations_year_histogram(spark):
    """year dims bucket by calendar year (date_histogram,
    min_doc_count=1 ≙ only seen years appear)."""
    out = SR.search_aggregations(
        _docs(spark), dims=("issued",), year_dims=("issued",)
    ).collect()
    got = {r["value"]: r["n"] for r in out}
    assert got == {"2012": 1, "2013": 3, "2014": 1}
