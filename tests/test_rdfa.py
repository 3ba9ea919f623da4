"""XHTML+RDFa render + distill (T3 as computation): the render →
re-parse identity the reference asserts per document
(documentrepository.render_xhtml_tree :1522-1708; render decorator
distill decorators.py:201-227 + assertEqualGraphs self-check)."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.rdfa import (
    distill_rdfa,
    distill_rdfa_text,
    render_rdfa,
)
from ferenda_spark.operators.turtle import RDF_TYPE, XSD
from ferenda_spark.operators.rdfa import DCT_TITLE as DCT_TITLE_

PREFIXES = {
    "dct": "http://purl.org/dc/terms/",
    "ex": "http://ex.org/",
    "xsd": XSD,
}


def _sample_triples(spark):
    d1 = "http://ex.org/doc/1"
    rows = [
        (d1, RDF_TYPE, "http://ex.org/Doc", True, None, None),
        (d1, "http://purl.org/dc/terms/title", "Huvudtitel", False, "sv", None),
        (d1, "http://purl.org/dc/terms/issued", "2020-01-01", False, None, XSD + "date"),
        (d1, "http://ex.org/ref", "http://ex.org/doc/2", True, None, None),
        # sub-resource (same doc root, needs about= scoping)
        (d1 + "#S1", "http://purl.org/dc/terms/title", "Avsnitt", False, "sv", None),
        (d1 + "#S1", "http://ex.org/isPartOf", d1, True, None, None),
        # nasty literal: quotes, newline, tab (attr-normalization trap)
        (d1 + "#S1", "http://ex.org/note", 'li"ne1\nline2\ttab', False, None, None),
        # second document root
        ("http://ex.org/doc/2", "http://purl.org/dc/terms/title", "Annan", False, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )


def test_render_shape(spark):
    docs = {r["doc"]: r["xhtml"] for r in render_rdfa(_sample_triples(spark), PREFIXES).collect()}
    assert set(docs) == {"http://ex.org/doc/1", "http://ex.org/doc/2"}
    x = docs["http://ex.org/doc/1"]
    assert '<head about="http://ex.org/doc/1">' in x
    # main subject's dcterms:title is a real <title> element
    assert '<title property="dct:title" xml:lang="sv">Huvudtitel</title>' in x
    # sub-resource triples carry about=
    assert 'about="http://ex.org/doc/1#S1"' in x
    # typed literal gets datatype CURIE, no lang
    assert 'datatype="xsd:date"' in x
    # newline/tab survive as char refs in content
    assert "&#10;" in x and "&#9;" in x
    assert 'prefix="dct: http://purl.org/dc/terms/' in x


def test_roundtrip_identity(spark):
    """render → distill returns the exact triple set — the T3
    contract, computed."""
    t = _sample_triples(spark)
    back = distill_rdfa(render_rdfa(t, PREFIXES), "xhtml")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_roundtrip_identity_no_prefixes(spark):
    """Full-IRI RDFa (no prefix map) round-trips too."""
    t = _sample_triples(spark)
    back = distill_rdfa(render_rdfa(t, None), "xhtml")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_distill_reference_patterns():
    """Hand-written head-RDFa in the exact shapes the reference
    emits (meta/link/title, rev, resource, inherited about)."""
    t = distill_rdfa_text(
        """<html xmlns="http://www.w3.org/1999/xhtml"
                 prefix="dct: http://purl.org/dc/terms/ ex: http://ex.org/">
        <head about="http://ex.org/d">
          <title property="dct:title">T</title>
          <meta property="dct:abstract" content="A" xml:lang="en"/>
          <link rel="ex:ref" href="http://ex.org/other"/>
          <link rev="ex:cites" href="http://ex.org/citing"/>
          <link about="http://ex.org/d#p1" rel="ex:isPartOf"
                resource="http://ex.org/d"/>
          <meta about="http://ex.org/d#p1" property="dct:title" content="P1"
                xml:lang=""/>
        </head><body/></html>"""
    )
    d = "http://ex.org/d"
    assert (d, "http://purl.org/dc/terms/title", "T", False, None, None) in t
    assert (d, "http://purl.org/dc/terms/abstract", "A", False, "en", None) in t
    assert (d, "http://ex.org/ref", "http://ex.org/other", True, None, None) in t
    # rev inverts subject/object
    assert ("http://ex.org/citing", "http://ex.org/cites", d, True, None, None) in t
    assert (d + "#p1", "http://ex.org/isPartOf", d, True, None, None) in t
    assert (d + "#p1", "http://purl.org/dc/terms/title", "P1", False, None, None) in t
    assert len(t) == 6


def test_lang_inheritance_and_reset():
    t = distill_rdfa_text(
        """<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="sv"
                 prefix="dct: http://purl.org/dc/terms/">
        <head about="http://ex.org/d">
          <meta property="dct:a" content="inherits"/>
          <meta property="dct:b" content="reset" xml:lang=""/>
          <meta property="dct:c" content="own" xml:lang="en"/>
        </head><body/></html>"""
    )
    langs = {r[1][-1]: r[4] for r in t}
    assert langs["a"] == "sv" and langs["b"] is None and langs["c"] == "en"


def test_strict_errors():
    with pytest.raises(ValueError):
        distill_rdfa_text("<broken")
    # note: an undeclared "pfx:local" can't be told apart from an
    # absolute IRI with scheme "pfx", so it passes through as an IRI
    # (RDFa 1.1 allows full IRIs in @property); only a term with no
    # colon at all is unresolvable
    with pytest.raises(ValueError):
        distill_rdfa_text(
            '<html xmlns="http://www.w3.org/1999/xhtml"><head about="u">'
            '<meta property="justaword" content="v"/></head></html>'
        )
    with pytest.raises(ValueError):
        distill_rdfa_text(
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            '<meta property="http://e.org/p" content="v"/></head></html>'
        )


def test_render_plan_single_shuffle(spark):
    """Render is one aggregation on the doc key: exactly one
    Exchange in the plan (plus nothing from the projection)."""
    plan = (
        render_rdfa(_sample_triples(spark), PREFIXES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2  # dedup + groupBy share the key
    assert "MapInPandas" not in plan  # render is pure JVM


def test_distill_plan_is_per_doc(spark):
    docs = render_rdfa(_sample_triples(spark), PREFIXES).select("xhtml")
    plan = distill_rdfa(docs, "xhtml")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_typed_title_roundtrips(spark):
    """A typed dcterms:title can't ride the datatype-less <title>
    element — it must take the meta path and round-trip."""
    d1 = "http://ex.org/doc/9"
    rows = [
        (d1, DCT_TITLE_, "T", False, None, XSD + "string"),
        (d1, DCT_TITLE_, "Plain", False, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    back = distill_rdfa(render_rdfa(t, PREFIXES), "xhtml")
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_carriage_return_title_roundtrips(spark):
    d1 = "http://ex.org/doc/10"
    rows = [(d1, DCT_TITLE_, "line1\rline2", False, None, None)]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    back = distill_rdfa(render_rdfa(t, None), "xhtml")
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_xml_illegal_control_raises_rdfa(spark):
    bad = spark.createDataFrame(
        [("http://ex.org/doc/11", "http://ex.org/p", "a\x02b", False, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    with pytest.raises(Exception) as ei:
        distill_rdfa(render_rdfa(bad, None), "xhtml").count()
    assert "illegal" in str(ei.value)
