"""Pathological inputs must flow through the full pipeline without
crashing (verify-skill probe list: malformed/empty/None html, docs
with no sections, no header), and the explicit salting helper must
be join-equivalent to the plain join."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.functions.salting import salted_join
from ferenda_spark.pipeline import build_kg
from ferenda_spark.sources.pages import PAGES_SCHEMA, synth_pages

TS = datetime(2020, 1, 1, tzinfo=timezone.utc)

BAD_PAGES = [
    ("https://bad.example.org/none-html", TS, None, None, "en"),
    ("https://bad.example.org/empty", TS, b"", "", "en"),
    ("https://bad.example.org/not-html", TS, b"\x00\xff\xfe garbage \x80", None, "en"),
    ("https://bad.example.org/unclosed", TS, b"<html><body><pre>no end", None, None),
    (
        "https://bad.example.org/no-header",
        TS,
        b"<html><body><pre>just a paragraph with no RFC header or sections</pre></body></html>",
        None,
        "en",
    ),
    (
        "https://bad.example.org/no-sections",
        TS,
        "<html><body><pre>Network Working Group  A. Author\n"
        "Request for Comments: 9999   Pub\nCategory: Odd   June 2020\n\n\n"
        "Title Line\n\nAbstract\n\n   Only an abstract, zero sections.\n"
        "</pre></body></html>".encode(),
        None,
        "en",
    ),
]


def test_pipeline_survives_garbage(spark):
    good = synth_pages(spark, 10, 42, PipelineConfig(), partitions=2)
    bad = spark.createDataFrame(BAD_PAGES, PAGES_SCHEMA)
    res = build_kg(spark, good.unionByName(bad))
    triples = res.triples.collect()
    # the 10 good docs still produce their triples
    assert len(triples) > 100
    # garbage rows never become doc subjects (no docid recovered)
    assert not any("bad.example.org" in t["subj"] for t in triples)
    # but extraction itself processed them (byte-identical rule holds
    # for well-formed rows; garbage rows yield rows, not crashes)
    docs = res.docs.collect()
    assert len(docs) == 16
    by_url = {d["url"]: d for d in docs}
    assert by_url["https://bad.example.org/empty"]["extracted_text"] == ""
    assert by_url["https://bad.example.org/none-html"]["extracted_text"] == ""
    # the no-header doc segments to zero sections, one doc row
    segs = [
        r
        for r in res.segments.collect()
        if r["url"] == "https://bad.example.org/no-header"
    ]
    assert [r["kind"] for r in segs] == ["doc"]


def test_salted_join_equivalence(spark):
    # Zipf-hot key 'x' on the big side
    big = spark.createDataFrame(
        [(("x" if i % 3 else f"k{i}"), i) for i in range(3000)], ["key", "payload"]
    )
    small = spark.createDataFrame(
        [("x", "HOT"), ("k1", "COLD1"), ("k500", "COLD2"), ("missing", "NEVER")],
        ["key", "label"],
    )
    plain = big.join(small, "key").select("key", "payload", "label")
    salted = salted_join(big, small, "key", salt=8).select("key", "payload", "label")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], ["key", "v"])
    small = spark.createDataFrame([("a", "A")], ["key", "label"])
    out = {r["key"]: r["label"] for r in salted_join(big, small, "key", salt=4, how="left").collect()}
    assert out == {"a": "A", "b": None}
