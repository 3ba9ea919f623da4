"""Scalar function library (SURVEY §2.9, facet.py:128-338 mirrors)."""

from datetime import datetime

from pyspark.sql import functions as F

from ferenda_spark.config import NS
from ferenda_spark.functions import scalars as S


def test_scalars(spark):
    df = spark.createDataFrame(
        [
            (
                "Hello World",
                "2024-03-15T10:00:00",
                "2024-03",
                "true",
                NS["dcterms"] + "title",
                "https://x.org/res/rfc/1234#S2.1",
            )
        ],
        ["label", "dt_full", "dt_ym", "flag", "pred_uri", "frag_uri"],
    )
    r = df.select(
        S.default_identificator(F.col("label")).alias("ident"),
        S.year_of(F.col("dt_full")).alias("y1"),
        S.year_of(F.col("dt_ym")).alias("y2"),
        S.boolean_value(F.col("flag")).alias("b"),
        S.term(F.col("pred_uri")).alias("t1"),
        S.term(F.col("frag_uri")).alias("t2"),
        S.qname(F.col("pred_uri")).alias("q"),
        S.resource_label(
            F.col("pred_uri"), {NS["dcterms"] + "title": "Title label"}
        ).alias("rl"),
        S.resource_label(F.col("frag_uri"), {}).alias("rl_fallback"),
        S.g_year_month(F.to_timestamp(F.col("dt_full"))).alias("gym"),
    ).first()
    assert r["ident"] == "hello-world"
    assert r["y1"] == 2024 and r["y2"] == 2024
    assert r["b"] is True
    assert r["t1"] == "title"
    assert r["t2"] == "S2.1"
    assert r["q"] == "dcterms:title"
    assert r["rl"] == "Title label"
    assert r["rl_fallback"] == "S2.1"
    assert r["gym"] == "2024-03"


def test_qname_longest_prefix_and_passthrough(spark):
    df = spark.createDataFrame(
        [("http://www.w3.org/2002/07/owl#sameAs",), ("https://no.such.ns/x",)],
        ["u"],
    )
    got = [r["q"] for r in df.select(S.qname(F.col("u")).alias("q")).collect()]
    assert got == ["owl:sameAs", "https://no.such.ns/x"]


def test_qname_nested_prefixes(spark):
    # dc: is a strict prefix of dcelem: — longest must win
    ns = {"dc": "http://purl.org/dc/", "dcelem": "http://purl.org/dc/elements/1.1/"}
    df = spark.createDataFrame(
        [("http://purl.org/dc/elements/1.1/title",), ("http://purl.org/dc/other",)],
        ["u"],
    )
    got = [r["q"] for r in df.select(S.qname(F.col("u"), ns).alias("q")).collect()]
    assert got == ["dcelem:title", "dc:other"]


def test_wildcard_rewrite(spark):
    rx = S.wildcard_to_rlike("foo*bar.baz")
    df = spark.createDataFrame(
        [("fooXYZbar.baz",), ("fooXYZbarQbaz",), ("foobar.baz",), ("Afoobar.baz",)],
        ["s"],
    )
    got = [r["s"] for r in df.filter(F.col("s").rlike(rx)).collect()]
    assert got == ["fooXYZbar.baz", "foobar.baz"]


def test_collation_key_swedish(spark):
    """documentrepository.py:2950-2952 strxfrm analog: å ä ö after z
    in that order (codepoint order would give ä < å < ö)."""
    from ferenda_spark.functions.scalars import collation_key
    from pyspark.sql import functions as F

    titles = ["Ärlig", "Zebra", "Åsna", "Öga", "Apelsin", "Väg", "Üte", "Élan"]
    df = spark.createDataFrame([(t,) for t in titles], ["t"])
    got = [
        r["t"]
        for r in df.orderBy(collation_key(F.col("t"), "sv_SE"), "t").collect()
    ]
    assert got == ["Apelsin", "Élan", "Väg", "Üte", "Zebra", "Åsna", "Ärlig", "Öga"]
    # danish: æ ø å after z in that order
    dk = ["Åben", "Ørn", "Æble", "Zoo"]
    df = spark.createDataFrame([(t,) for t in dk], ["t"])
    got = [r["t"] for r in df.orderBy(collation_key(F.col("t"), "da_DK"), "t").collect()]
    assert got == ["Zoo", "Æble", "Ørn", "Åben"]
    # no locale: accent-fold only
    df = spark.createDataFrame([("Élan",), ("ebb",)], ["t"])
    got = [r["t"] for r in df.orderBy(collation_key(F.col("t"), None), "t").collect()]
    assert got == ["ebb", "Élan"]


def test_icu_collation_swedish(spark):
    """Spark 4 engine-native ICU path (scalars.icu_collation_col):
    full CLDR sv tailoring — å < ä < ö after z, v/w NOT folded
    (modern sv ICU), ß groups with ss, punctuation/digits first."""
    from pyspark.sql import functions as F

    from ferenda_spark.functions.scalars import icu_collation_col

    titles = [
        "Ärlig", "Zebra", "Åsna", "Öga", "Apelsin", "Väg",
        "Vin", "win", "Wien", "-streck", "12 möss",
    ]
    df = spark.createDataFrame([(t,) for t in titles], ["t"])
    got = [
        r["t"]
        for r in df.orderBy(icu_collation_col(F.col("t"), "sv_SE"), "t").collect()
    ]
    assert got == [
        "-streck", "12 möss", "Apelsin", "Vin", "Väg", "Wien",
        "win", "Zebra", "Åsna", "Ärlig", "Öga",
    ]


def test_toc_select_for_pages_icu(spark):
    """toc_select_for_pages(icu=True) ranks within a letter group by
    the ICU collated order, not codepoint order."""
    from ferenda_spark.operators.query import toc_select_for_pages

    rows = [("här", 1), ("halv", 2), ("hö", 3), ("hä", 4), ("håla", 5)]
    df = spark.createDataFrame(rows, ["title", "id"])
    out = toc_select_for_pages(
        df, "title", "id", per_page=5, collate_locale="sv_SE", icu=True
    )
    got = [r["title"] for r in out.filter("letter = 'h'").orderBy("rn").collect()]
    assert got == ["halv", "håla", "hä", "här", "hö"]
