"""RDF/XML reader/writer: grammar coverage, the reference's shipped
.rdf fixture, and write→read round-trips (reference parity:
distilled/{basefile}.rdf written via rdflib serialize(format="xml"),
read via Graph().parse(format="xml") —
documentrepository.py:2729-2732, :2052)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.rdfxml import (
    parse_rdfxml_docs,
    parse_rdfxml_text,
    read_rdfxml,
    to_rdfxml,
    write_rdfxml,
)
from ferenda_spark.operators.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD

REF_RDF = "/root/reference/test/files/repo/soukb/downloaded/1972/47/index.rdf"


def test_node_and_property_forms():
    t = parse_rdfxml_text(
        """<?xml version="1.0"?>
        <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:e="http://e.org/">
          <e:Doc rdf:about="http://e.org/d1" e:short="attr">
            <e:title xml:lang="sv">Titel</e:title>
            <e:num rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</e:num>
            <e:ref rdf:resource="http://e.org/d2"/>
            <e:empty></e:empty>
          </e:Doc>
        </rdf:RDF>""",
        "sc",
    )
    s = "http://e.org/d1"
    assert (s, RDF_TYPE, "http://e.org/Doc", True, None, None) in t
    assert (s, "http://e.org/short", "attr", False, None, None) in t
    assert (s, "http://e.org/title", "Titel", False, "sv", None) in t
    assert (s, "http://e.org/num", "5", False, None, XSD + "int") in t
    assert (s, "http://e.org/ref", "http://e.org/d2", True, None, None) in t
    assert (s, "http://e.org/empty", "", False, None, None) in t
    assert len(t) == 6


def test_base_resolution_and_rdf_id():
    t = parse_rdfxml_text(
        """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                    xmlns:e="http://e.org/" xml:base="http://b.org/dir/">
          <rdf:Description rdf:about="rel">
            <e:p rdf:resource="../up"/>
          </rdf:Description>
          <rdf:Description rdf:ID="frag"><e:q>v</e:q></rdf:Description>
        </rdf:RDF>""",
        "sc",
    )
    assert ("http://b.org/dir/rel", "http://e.org/p", "http://b.org/up", True, None, None) in t
    assert ("http://b.org/dir/#frag", "http://e.org/q", "v", False, None, None) in t


def test_nested_nodes_parsetype_and_containers():
    t = parse_rdfxml_text(
        """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                    xmlns:e="http://e.org/">
          <rdf:Description rdf:about="http://e.org/s">
            <e:nested><e:Inner rdf:nodeID="n1"><e:v>x</e:v></e:Inner></e:nested>
            <e:res rdf:parseType="Resource"><e:a>1</e:a></e:res>
            <e:lit rdf:parseType="Literal">raw <b>xml</b></e:lit>
            <e:coll rdf:parseType="Collection">
              <rdf:Description rdf:about="http://e.org/c1"/>
              <rdf:Description rdf:about="http://e.org/c2"/>
            </e:coll>
          </rdf:Description>
          <rdf:Seq rdf:about="http://e.org/seq">
            <rdf:li>a</rdf:li><rdf:li>b</rdf:li>
          </rdf:Seq>
        </rdf:RDF>""",
        "sc",
    )
    s = "http://e.org/s"
    assert ("urn:bnode:sc:n1", "http://e.org/v", "x", False, None, None) in t
    assert (s, "http://e.org/nested", "urn:bnode:sc:n1", True, None, None) in t
    res = [r for r in t if r[1] == "http://e.org/res"][0]
    assert ([r for r in t if r[0] == res[2]][0][2]) == "1"
    lit = [r for r in t if r[1] == "http://e.org/lit"][0]
    assert "<b>xml</b>" in lit[2]
    assert lit[5].endswith("XMLLiteral")
    head = [r for r in t if r[1] == "http://e.org/coll"][0][2]
    firsts = {r[0]: r[2] for r in t if r[1] == RDF_FIRST}
    rests = {r[0]: r[2] for r in t if r[1] == RDF_REST}
    assert firsts[head] == "http://e.org/c1"
    assert firsts[rests[head]] == "http://e.org/c2"
    assert rests[rests[head]] == RDF_NIL
    li = {r[1]: r[2] for r in t if "_" in r[1].rsplit("#", 1)[-1]}
    assert li["http://www.w3.org/1999/02/22-rdf-syntax-ns#_1"] == "a"
    assert li["http://www.w3.org/1999/02/22-rdf-syntax-ns#_2"] == "b"


def test_strict_errors():
    with pytest.raises(ValueError):
        parse_rdfxml_text("<not closed", "sc")
    with pytest.raises(ValueError):
        parse_rdfxml_text(
            """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                        xmlns:e="http://e.org/">
            <rdf:Description rdf:about="http://e.org/s">
              <e:p rdf:ID="reify">v</e:p>
            </rdf:Description></rdf:RDF>""",
            "sc",
        )
    with pytest.raises(ValueError):
        parse_rdfxml_text(
            """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                        xmlns:e="http://e.org/">
            <rdf:Description rdf:about="http://e.org/s">
              <e:p rdf:parseType="Bogus">v</e:p>
            </rdf:Description></rdf:RDF>""",
            "sc",
        )


@pytest.mark.skipif(not os.path.exists(REF_RDF), reason="reference absent")
def test_reference_fixture():
    """The one .rdf the reference ships (a libris bibliographic
    record): 15 statements, no rdf-syntax attributes leaking as
    property triples, values spot-checked."""
    with open(REF_RDF) as fh:
        t = parse_rdfxml_text(fh.read(), "sc")
    assert len(t) == 15
    assert not [r for r in t if r[1].startswith("http://www.w3.org/1999/02/22-rdf-syntax-ns#") and r[1] != RDF_TYPE]
    s = "http://libris.kb.se/resource/bib/8350729"
    assert (s, RDF_TYPE, "http://purl.org/ontology/bibo/Book", True, None, None) in t
    # the fixture's Swedish title is NFD-encoded (combining
    # diaeresis); the parser must preserve it byte-exactly, so
    # compare after NFC-normalizing both sides
    import unicodedata

    titles = [r[2] for r in t if r[1] == "http://purl.org/dc/elements/1.1/title"]
    assert [unicodedata.normalize("NFC", v) for v in titles] == [
        "Data och integritet : betänkande"
    ]
    assert titles[0] != unicodedata.normalize("NFC", titles[0])  # stayed NFD
    assert (s, "http://purl.org/dc/elements/1.1/publisher", "", False, None, None) in t


def _sample_triples(spark):
    rows = [
        ("http://ex.org/d1", RDF_TYPE, "http://ex.org/Doc", True, None, None),
        ("http://ex.org/d1", "http://purl.org/dc/terms/title",
         'A <b> & "quoted" title', False, "sv", None),
        ("http://ex.org/d1", "http://purl.org/dc/terms/issued",
         "2020-01-01", False, None, XSD + "date"),
        ("http://ex.org/d1", "http://ex.org/ref", "http://ex.org/d2", True, None, None),
        ("http://ex.org/d2", "http://purl.org/dc/terms/title", "plain", False, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )


def test_roundtrip_through_file(spark, tmp_path):
    t = _sample_triples(spark)
    path = str(tmp_path / "out.rdf")
    write_rdfxml(t, path)
    part = sorted(glob.glob(path + "/part-*"))[0]
    text = open(part).read()
    assert text.startswith('<rdf:RDF')
    assert text.rstrip().endswith("</rdf:RDF>")
    back = read_rdfxml(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_roundtrip_through_blocks(spark):
    """Each Description block is a self-contained RDF/XML document
    (inline xmlns per property element) — the distributed shape."""
    t = _sample_triples(spark)
    back = parse_rdfxml_docs(to_rdfxml(t), "block")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_writer_rejects_unsplittable_predicate(spark):
    bad = spark.createDataFrame(
        [("http://e.org/s", "http://e.org/p/", "v", False, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    with pytest.raises(Exception) as ei:
        parse_rdfxml_docs(to_rdfxml(bad), "block").count()
    assert "NCName" in str(ei.value)


def test_parser_plan_is_per_file(spark):
    docs = spark.createDataFrame(
        [(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
            ' xmlns:e="http://e.org/">'
            '<rdf:Description rdf:about="http://e.org/s"><e:p>v</e:p>'
            "</rdf:Description></rdf:RDF>",
        )],
        "doc string",
    )
    plan = (
        parse_rdfxml_docs(docs, "doc")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_carriage_return_literal_roundtrips(spark):
    """XML line-end normalization folds raw \\r to \\n; the writer
    must emit &#13; so literals survive byte-exactly."""
    rows = [("http://e.org/s", "http://e.org/p", "a\rb\r\nc", False, None, None)]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    back = parse_rdfxml_docs(to_rdfxml(t), "block")
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_xml_illegal_control_raises(spark):
    bad = spark.createDataFrame(
        [("http://e.org/s", "http://e.org/p", "a\x01b", False, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    with pytest.raises(Exception) as ei:
        parse_rdfxml_docs(to_rdfxml(bad), "block").count()
    assert "illegal" in str(ei.value)


def test_uri_literal_twin_triples_both_survive(spark):
    rows = [
        ("http://e.org/s", "http://e.org/p", "http://x.org/", True, None, None),
        ("http://e.org/s", "http://e.org/p", "http://x.org/", False, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    back = parse_rdfxml_docs(to_rdfxml(t), "block")
    assert sorted(map(tuple, back.collect())) == sorted(rows)
