"""SPARQL text front-end (operators/sparql.py): the reference's own
query files run verbatim on the distributed BGP engine."""

import os

import pytest

from ferenda_spark.operators.sparql import (
    SparqlSyntaxError,
    parse_sparql,
    run_sparql,
)
from tests.test_graphquery import ROWS, SCHEMA

#: VERBATIM copy of the reference's only shipped SPARQL template,
#: /root/reference/ferenda/res/sparql/annotations.rq (the per-doc
#: annotation CONSTRUCT, documentrepository.py construct_annotations)
#: — kept as a test fixture so the suite is hermetic; the drift
#: guard below re-checks it against the reference file when present.
ANNOTATIONS_RQ = """\
# Maybe should be called describe.rq instead?
PREFIX dcterms: <http://purl.org/dc/terms/>

CONSTRUCT
{
   ?part dcterms:isReferencedBy ?s .
   ?s ?p ?o .
}
WHERE 
{
  ?s ?p ?o .
  {
    ?s dcterms:isPartOf* <%(uri)s> .
  }
  UNION
  {
    ?part dcterms:isPartOf* <%(uri)s> .
    ?s dcterms:references ?part .
  }
}
"""

_REF_RQ = "/root/reference/ferenda/res/sparql/annotations.rq"


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_fixture_matches_reference_file():
    if not os.path.exists(_REF_RQ):
        pytest.skip("reference tree not present")
    with open(_REF_RQ) as f:
        assert f.read() == ANNOTATIONS_RQ


def test_parse_select():
    q = parse_sparql(
        """PREFIX dc: <http://purl.org/dc/terms/>
        SELECT ?s ?t WHERE {
          ?s a <http://x/Doc> ; dc:title ?t .
          FILTER (?t != "skip")
        }"""
    )
    assert q["form"] == "SELECT"
    assert q["select_vars"] == ["s", "t"]
    assert (
        "?s",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://x/Doc",
    ) in q["where"]["patterns"]
    assert ("?s", "http://purl.org/dc/terms/title", "?t") in q["where"]["patterns"]
    assert q["where"]["filters"] == ["t != 'skip'"]


def test_select_runs(spark, g):
    got = run_sparql(
        g,
        """SELECT ?doc ?t WHERE {
             ?doc <type> <Doc> .
             ?doc <title> ?t .
             FILTER (?t != "Beta")
           }""",
    ).collect()
    assert [tuple(r) for r in got] == [("d1", "Alpha")]


def test_union_runs(spark, g):
    got = run_sparql(
        g,
        """SELECT ?x WHERE {
             { ?x <publisher> ?pub . } UNION { ?x <references> <d1> . }
           }""",
    ).collect()
    assert {r["x"] for r in got} == {"d1", "d2#s1"}


def test_star_path_with_ground_endpoint(spark, g):
    # partOf* from d1: zero hops (d1 itself) + one hop (d1#s1)
    got = run_sparql(
        g, "SELECT ?s WHERE { ?s <partOf>* <d1> . }"
    ).collect()
    assert {r["s"] for r in got} == {"d1", "d1#s1"}


def test_unsupported_syntax_raises(spark):
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("ASK { ?s ?p ?o }")
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?s WHERE { ?s x ?o }")  # bare non-keyword term


def test_annotations_rq_on_tiny_graph(spark):
    """The verbatim reference template against a dcterms-vocabulary
    mini graph, anchored at d1: branch 1 collects all triples of d1
    and its isPartOf* descendants; branch 2 adds isReferencedBy
    back-links from resources citing them."""
    DCT = "http://purl.org/dc/terms/"
    rows_in = [
        ("d1", DCT + "title", "Alpha", False, "en", None),
        ("d1#s1", DCT + "isPartOf", "d1", True, None, None),
        ("d1#s1", DCT + "title", "Intro", False, "en", None),
        ("d1#s1#sub", DCT + "isPartOf", "d1#s1", True, None, None),
        ("d2", DCT + "title", "Beta", False, "en", None),
        ("d2#s1", DCT + "isPartOf", "d2", True, None, None),
        ("d2#s1", DCT + "references", "d1#s1", True, None, None),
    ]
    g2 = spark.createDataFrame(rows_in, SCHEMA)
    out = run_sparql(g2, ANNOTATIONS_RQ, params={"uri": "d1"})
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert ("d1", DCT + "title", "Alpha") in rows          # zero-hop self
    assert ("d1#s1", DCT + "title", "Intro") in rows       # 1-hop part
    assert (
        "d1#s1#sub",
        DCT + "isPartOf",
        "d1#s1",
    ) in rows                                              # 2-hop part
    assert ("d2", DCT + "title", "Beta") not in rows       # unrelated doc
    # back-link: d2#s1 references d1#s1 -> isReferencedBy edge
    assert ("d1#s1", DCT + "isReferencedBy", "d2#s1") in rows
    # the citing resource's own triples come along (branch 2 ?s ?p ?o)
    assert ("d2#s1", DCT + "references", "d1#s1") in rows


def test_annotations_rq_matches_native_operator(spark):
    """Flagship parity: the reference's VERBATIM annotations.rq,
    executed by the SPARQL front-end over the live KG, selects the
    same resource set as the native relate.annotations operator for
    the same document (both implement
    documentrepository.construct_annotations)."""
    from ferenda_spark.config import DCT
    from ferenda_spark.operators.relate import annotations
    from ferenda_spark.queries import _kg

    kg = _kg(spark, None)
    doc_uri = (
        kg.doc_directory.orderBy("doc_uri").limit(1).collect()[0]["doc_uri"]
    )
    rq = run_sparql(kg.triples, ANNOTATIONS_RQ, params={"uri": doc_uri})
    native = annotations(kg.triples).filter(f"doc_uri = '{doc_uri}'")

    # native rows are (doc_uri, subj, pred, obj); the CONSTRUCT's
    # plain ?s ?p ?o triples must reproduce exactly that set, and
    # its isReferencedBy back-links must mirror native's inbound
    # dcterms:references rows
    rq_rows = {
        (r["subj"], r["pred"], r["obj"])
        for r in rq.collect()
        if r["pred"] != DCT + "isReferencedBy"
    }
    native_rows = {(r["subj"], r["pred"], r["obj"]) for r in native.collect()}
    assert rq_rows == native_rows
    back = {
        (r["obj"], r["subj"])
        for r in rq.collect()
        if r["pred"] == DCT + "isReferencedBy"
    }
    refs = {
        (r["subj"], r["obj"])
        for r in native.collect()
        if r["pred"] == DCT + "references"
        # inbound only: the back-link branch targets members of THIS
        # doc (outbound citations from its own sections are plain
        # `own` rows on both sides, already compared above)
        and (r["obj"] == doc_uri or r["obj"].startswith(doc_uri + "#"))
    }
    assert back == refs
    assert len(rq_rows) > 5
