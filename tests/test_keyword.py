"""C10 keyword aggregation (sources/general/keyword.py:107-230)."""

from ferenda_spark.operators.keyword import keyword_terms, sanitize_term
from pyspark.sql import functions as F

TRIPLES_COLS = ["subj", "pred", "obj"]


def test_sanitize_term_rules(spark):
    cases = [
        ("  multiple   spaces  ", "multiple spaces"),  # normalize_space
        ("ok", "ok"),
        ("x", None),  # too short (min 2)
        ("a" * 101, None),  # too long (max 100)
        (".dotstart", None),
        ("/slashstart", None),
        (":colonstart", None),
        ("dotend.", None),
        ("commaend,", None),
        ("mid.dot ok", "mid.dot ok"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["t"])
    got = [r["s"] for r in df.select(sanitize_term(F.col("t")).alias("s")).collect()]
    assert got == [want for _, want in cases]


def test_keyword_terms_labels_termsets(spark):
    triples = spark.createDataFrame(
        [
            # doc1, doc2 -> subject A (labelled); doc2 -> subject B (no label)
            ("d:1", "p:subject", "s:A"),
            ("d:2", "p:subject", "s:A"),
            ("d:2", "p:subject", "http://x/things/widget-b"),
            ("s:A", "p:label", "Term A"),
            # invalid term after sanitize: dropped entirely
            ("d:3", "p:subject", "s:bad"),
            ("s:bad", "p:label", ".invalid"),
        ],
        TRIPLES_COLS,
    )
    mw = spark.createDataFrame([("widget-b",), ("wiki only",)], ["title"])
    wp = spark.createDataFrame([("Term A",), ("wiki only",), ("absent",)], ["title"])
    rows = {
        r["term"]: r
        for r in keyword_terms(
            triples, "p:subject", "p:label", mw, wp
        ).collect()
    }
    assert set(rows) == {"Term A", "widget-b", "wiki only"}
    a = rows["Term A"]
    assert (a["n_refs"], a["first_subject"]) == (2, "d:1")
    assert (a["in_mediawiki"], a["in_wikipedia"]) == (False, True)
    b = rows["widget-b"]  # uri-leaf fallback + mediawiki member
    assert (b["n_refs"], b["in_mediawiki"], b["in_wikipedia"]) == (1, True, False)
    w = rows["wiki only"]  # mediawiki ADDS terms...
    assert (w["n_refs"], w["first_subject"]) == (0, None)
    assert (w["in_mediawiki"], w["in_wikipedia"]) == (True, True)
    # ...but wikipedia only flags: "absent" never became a term
    assert "absent" not in rows
