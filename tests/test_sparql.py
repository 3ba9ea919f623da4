"""SPARQL text front-end (operators/sparql.py): the reference's own
query files run verbatim on the distributed BGP engine."""

import glob
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
        # SPARQL Update is a different protocol surface entirely
        parse_sparql("INSERT DATA { <a> <b> <c> }")
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

# ---------------------------------------------------------------
# The COMPLETE reference .rq corpus, verbatim
# ---------------------------------------------------------------

#: every SPARQL file the reference ships (ferenda/res/sparql,
#: sources/*/res/sparql, lagen/nu/res/sparql, doc/examples)
_CORPUS = sorted(glob.glob("/root/reference/**/*.rq", recursive=True))

#: the corpus' full template-parameter inventory (%(uri)s etc.)
_PARAMS = {
    "uri": "http://ex.org/doc/1",
    "context": "http://ex.org/ctx",
    "tempuri": "http://ex.org/temp/1",
}


@pytest.mark.skipif(not _CORPUS, reason="reference tree not present")
@pytest.mark.parametrize(
    "path", _CORPUS, ids=[os.path.basename(p) for p in _CORPUS]
)
def test_reference_corpus_parses(path):
    """Every .rq file the reference ships parses verbatim — the
    front-end covers the corpus' complete construct inventory
    (DISTINCT, GRAPH, BIND, IN/STRSTARTS/STR/isUri filters,
    isPartOf{,1} quantifiers, paths, UNION chains, OPTIONALs)."""
    with open(path) as f:
        q = parse_sparql(f.read(), params=_PARAMS)
    assert q["form"] in ("SELECT", "CONSTRUCT")
    w = q["where"]
    assert (
        w["patterns"] or w["unions"] or w["graphs"]
    ), f"{path}: parsed to an empty WHERE"


RFC = "http://example.org/ontology/rfc/"
DCT = "http://purl.org/dc/terms/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rfc_annotations_rq_verbatim(spark):
    """/root/reference/ferenda/sources/tech/res/sparql/
    rfc-annotations.rq executed verbatim: 5-way UNION with
    BIND(?s as ?referencer), !isUri(?o), ?x IN (...), and
    STRSTARTS(STR(?o), ...) filters."""
    path = "/root/reference/ferenda/sources/tech/res/sparql/rfc-annotations.rq"
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    uri = "http://ex.org/rfc/10"
    rows_in = [
        # branch 1: literal metadata of the doc itself; the URI-valued
        # triple must be dropped by !isUri(?o)
        (uri, DCT + "title", "Ten", False, "en", None),
        (uri, RDF + "seeAlso", "http://ex.org/rfc/9", True, None, None),
        # branch 2: a resource citing the doc (kept), with one
        # unrelated dcterms:references that the filter must drop
        ("http://ex.org/r1", DCT + "references", uri, True, None, None),
        ("http://ex.org/r1", DCT + "identifier", "R1", False, None, None),
        ("http://ex.org/r1", DCT + "references",
         "http://other/doc", True, None, None),
        # branch 3+5: an updater, with its own metadata
        ("http://ex.org/u1", RFC + "updates", uri, True, None, None),
        ("http://ex.org/u1", DCT + "identifier", "U1", False, None, None),
        # branch 4: an obsoleter
        ("http://ex.org/o1", RFC + "obsoletes", uri, True, None, None),
    ]
    g2 = spark.createDataFrame(rows_in, SCHEMA)
    with open(path) as f:
        out = run_sparql(g2, f.read(), params={"uri": uri})
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    # branch 1: literal metadata survives, URI-valued object does not
    assert (uri, DCT + "title", "Ten") in rows
    assert (uri, RDF + "seeAlso", "http://ex.org/rfc/9") not in rows
    # branch 2 + BIND: citing resource emitted, back-link minted,
    # unrelated reference filtered
    assert (uri, DCT + "isReferencedBy", "http://ex.org/r1") in rows
    assert ("http://ex.org/r1", DCT + "identifier", "R1") in rows
    assert ("http://ex.org/r1", DCT + "references", uri) in rows
    assert ("http://ex.org/r1", DCT + "references", "http://other/doc") not in rows
    # branches 3/4/5: updater/obsoleter links + updater metadata
    assert (uri, RFC + "isUpdatedBy", "http://ex.org/u1") in rows
    assert (uri, RFC + "isObsoletedBy", "http://ex.org/o1") in rows
    assert ("http://ex.org/u1", DCT + "identifier", "U1") in rows
    # minted link objects are URIs (subject-position metadata default)
    link = {
        (r["pred"], r["obj_is_uri"])
        for r in out.collect()
        if r["pred"] in (RFC + "isUpdatedBy", RFC + "isObsoletedBy")
    }
    assert link == {(RFC + "isUpdatedBy", True), (RFC + "isObsoletedBy", True)}


def test_graph_scoping_keyword_sfs_verbatim(spark):
    """keyword_sfs.rq verbatim: GRAPH <%(context)s> scopes matching
    to that graph's rows when the table has a `graph` column, and is
    the identity on a single-graph table."""
    path = "/root/reference/lagen/nu/res/sparql/keyword_sfs.rq"
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    kw, ctx = "http://ex.org/kw/tax", "http://ex.org/ctx"
    base = [
        # in-context: section s1 tagged with the keyword, part of base
        ("http://ex.org/s1", DCT + "subject", kw, True, None, None),
        ("http://ex.org/s1", DCT + "isPartOf", "http://ex.org/base", True, None, None),
        ("http://ex.org/base", DCT + "title", "Base law", False, "sv", None),
        # decoy in another graph: same shape, must be invisible
        ("http://ex.org/s2", DCT + "subject", kw, True, None, None),
        ("http://ex.org/s2", DCT + "isPartOf", "http://ex.org/other", True, None, None),
        ("http://ex.org/other", DCT + "title", "Other law", False, "sv", None),
    ]
    graphs = [ctx] * 3 + ["http://ex.org/elsewhere"] * 3
    g3 = spark.createDataFrame(
        [r + (gr,) for r, gr in zip(base, graphs)], SCHEMA + ", graph string"
    )
    with open(path) as f:
        text = f.read()
    got = {
        tuple(r)
        for r in run_sparql(
            g3, text, params={"uri": kw, "context": ctx}
        ).collect()
    }
    assert got == {
        ("http://ex.org/s1", "http://ex.org/base", "Base law")
    }
    # single-graph table (no `graph` column): GRAPH is the identity
    g4 = spark.createDataFrame(base, SCHEMA)
    got4 = {
        r["baseuri"]
        for r in run_sparql(
            g4, text, params={"uri": kw, "context": ctx}
        ).collect()
    }
    assert got4 == {"http://ex.org/base", "http://ex.org/other"}


def test_sfs_changes_rq_verbatim(spark):
    """sfs_changes.rq verbatim: SELECT DISTINCT, variable predicate,
    ?changetype IN (...), STRSTARTS, three OPTIONALs."""
    path = (
        "/root/reference/ferenda/sources/legal/se/res/sparql/sfs_changes.rq"
    )
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    RP = "http://rinfo.lagrummet.se/ns/2008/11/rinfo/publ#"
    uri = "http://ex.org/sfs/1999:175"
    rows_in = [
        ("http://ex.org/chg1", RP + "ersatter", uri + "#p1", True, None, None),
        ("http://ex.org/chg1", DCT + "identifier", "SFS 1", False, None, None),
        ("http://ex.org/chg1", RP + "forarbete", "http://ex.org/prop1", True, None, None),
        ("http://ex.org/prop1", RDF + "type", RP + "Proposition", True, None, None),
        ("http://ex.org/prop1", DCT + "identifier", "Prop. 1", False, None, None),
        # decoy: a changetype outside the IN list
        ("http://ex.org/chg2", RP + "andrar", uri + "#p2", True, None, None),
        ("http://ex.org/chg2", DCT + "identifier", "SFS 2", False, None, None),
        ("http://ex.org/chg2", RP + "forarbete", "http://ex.org/prop1", True, None, None),
    ]
    g2 = spark.createDataFrame(rows_in, SCHEMA)
    with open(path) as f:
        got = run_sparql(g2, f.read(), params={"uri": uri}).collect()
    assert [tuple(r) for r in got] == [
        (
            "http://ex.org/chg1",
            RP + "ersatter",
            "SFS 1",
            uri + "#p1",
            None,          # OPTIONAL ikraft unbound
            "http://ex.org/prop1",
            "Prop. 1",
            None,          # OPTIONAL proptitle unbound
        )
    ]


def test_prop_annotations_rq_verbatim(spark):
    """prop-annotations.rq verbatim: isPartOf{,1} bounded quantifier
    + STRSTARTS(STR(?a), STR(?b)) with two variable arguments."""
    path = (
        "/root/reference/ferenda/sources/legal/se/res/sparql/"
        "prop-annotations.rq"
    )
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    uri = "http://ex.org/doc/1"
    rows_in = [
        # a section of the doc (1 hop) cited by ref1's chapter
        (uri + "#s1", DCT + "isPartOf", uri, True, None, None),
        ("http://ex.org/ref1#c1", DCT + "references", uri + "#s1", True, None, None),
        ("http://ex.org/ref1#c1", DCT + "isPartOf", "http://ex.org/ref1", True, None, None),
        ("http://ex.org/ref1", DCT + "title", "Ref doc", False, None, None),
        # a 2-hop descendant cited by ref2: OUTSIDE isPartOf{,1}
        (uri + "#s1#sub", DCT + "isPartOf", uri + "#s1", True, None, None),
        ("http://ex.org/ref2", DCT + "references", uri + "#s1#sub", True, None, None),
    ]
    g2 = spark.createDataFrame(rows_in, SCHEMA)
    with open(path) as f:
        out = run_sparql(g2, f.read(), params={"uri": uri})
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert (uri + "#s1", DCT + "isReferencedBy", "http://ex.org/ref1#c1") in rows
    assert ("http://ex.org/ref1", DCT + "title", "Ref doc") in rows
    # the 2-hop part is beyond the {,1} bound: no back-link for ref2
    assert (
        uri + "#s1#sub",
        DCT + "isReferencedBy",
        "http://ex.org/ref2",
    ) not in rows


def test_facet_query_verbatim(spark):
    """The exact SELECT the reference's facet_query() generates
    (documentrepository.py:2319 doctest): SELECT DISTINCT with a
    FROM <graph> dataset clause and five OPTIONALs."""
    FOAF = "http://xmlns.com/foaf/0.1/"
    query = """PREFIX dcterms: <http://purl.org/dc/terms/>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

SELECT DISTINCT ?uri ?rdf_type ?dcterms_title ?dcterms_publisher ?dcterms_identifier ?dcterms_issued
FROM <http://example.org/ctx/base>
WHERE {
    ?uri rdf:type foaf:Document .
    OPTIONAL { ?uri rdf:type ?rdf_type . }
    OPTIONAL { ?uri dcterms:title ?dcterms_title . }
    OPTIONAL { ?uri dcterms:publisher ?dcterms_publisher . }
    OPTIONAL { ?uri dcterms:identifier ?dcterms_identifier . }
    OPTIONAL { ?uri dcterms:issued ?dcterms_issued . }

}"""
    ctx = "http://example.org/ctx/base"
    base = [
        ("d1", RDF + "type", FOAF + "Document", True, None, None),
        ("d1", DCT + "title", "Alpha", False, "en", None),
        # decoy in another named graph: FROM must exclude it
        ("d9", RDF + "type", FOAF + "Document", True, None, None),
    ]
    graphs = [ctx, ctx, "http://example.org/ctx/other"]
    g3 = spark.createDataFrame(
        [r + (gr,) for r, gr in zip(base, graphs)], SCHEMA + ", graph string"
    )
    got = run_sparql(g3, query).collect()
    assert [tuple(r) for r in got] == [
        ("d1", FOAF + "Document", "Alpha", None, None, None)
    ]


def test_triple_count_verbatim(spark):
    """The reference's FusekiStore.triple_count SELECT COUNT(*)
    queries (triplestore.py:665,670) run verbatim: per-context via
    GRAPH, and the default-graph form."""
    base = [
        ("a", "p", "x", False, None, None),
        ("a", "q", "y", False, None, None),
        ("b", "p", "z", False, None, None),
    ]
    graphs = ["http://ex.org/g1", "http://ex.org/g1", "http://ex.org/g2"]
    g3 = spark.createDataFrame(
        [r + (gr,) for r, gr in zip(base, graphs)], SCHEMA + ", graph string"
    )
    ctx_q = "SELECT COUNT(*) WHERE { GRAPH <%(uri)s> { ?s ?p ?o}}"
    got = run_sparql(
        g3, ctx_q, params={"uri": "http://ex.org/g1"}
    ).collect()
    assert [tuple(r) for r in got] == [(2,)]
    # default graph (single-graph table): counts everything
    g4 = spark.createDataFrame(base, SCHEMA)
    got4 = run_sparql(g4, "SELECT COUNT(*) WHERE {?s ?p ?o}").collect()
    assert [tuple(r) for r in got4] == [(3,)]


@pytest.mark.skipif(not _CORPUS, reason="reference tree not present")
def test_reference_corpus_executes(spark):
    """Every corpus file also COMPILES AND RUNS (not just parses)
    against a small multi-graph triples table — exercising every
    compile path (GRAPH-scoped filters, var-var zero-hop paths,
    UNION-branch binds) even where the vocabulary yields no rows."""
    rows = [
        ("a", DCT + "references", "b", True, None, None, "http://ex.org/ctx"),
        ("b", DCT + "isPartOf", "c", True, None, None, "http://ex.org/ctx"),
        ("c", DCT + "title", "C doc", False, "en", None, "http://ex.org/ctx"),
    ]
    g3 = spark.createDataFrame(rows, SCHEMA + ", graph string")
    for path in _CORPUS:
        with open(path) as f:
            out = run_sparql(g3, f.read(), params=_PARAMS)
        n = out.count()  # must not raise; row count itself is free
        assert n >= 0, path


def test_order_by_limit_offset(spark, g):
    """Solution modifiers compile to the paginate top-limit plan:
    ORDER BY DESC(?v) LIMIT/OFFSET slices deterministically and the
    physical plan is TakeOrderedAndProject, not a global sort."""
    q = """SELECT ?doc ?t WHERE { ?doc <title> ?t . }
           ORDER BY DESC(?t) LIMIT 2"""
    out = run_sparql(g, q)
    assert [tuple(r) for r in out.collect()] == [
        ("d1#s1", "Intro"), ("d2", "Beta")
    ]
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()
    # OFFSET pages past the first result
    q2 = """SELECT ?doc ?t WHERE { ?doc <title> ?t . }
            ORDER BY DESC(?t) LIMIT 2 OFFSET 1"""
    assert [tuple(r) for r in run_sparql(g, q2).collect()] == [
        ("d2", "Beta"), ("d1", "Alpha")
    ]
    # bare LIMIT bounds the result; OFFSET alone is refused
    assert run_sparql(g, "SELECT ?doc WHERE { ?doc <type> <Doc> . } LIMIT 1").count() == 1
    with pytest.raises(SparqlSyntaxError):
        run_sparql(g, "SELECT ?doc WHERE { ?doc <type> <Doc> . } OFFSET 1")


def test_minus_and_not_exists(spark, g):
    """Negation compiles to the native anti-join: docs with a title
    but no publisher, via both MINUS and FILTER NOT EXISTS."""
    for neg in (
        "MINUS { ?doc <publisher> ?pub . }",
        "FILTER NOT EXISTS { ?doc <publisher> ?pub . }",
    ):
        got = run_sparql(
            g,
            "SELECT ?doc WHERE { ?doc <type> <Doc> . %s }" % neg,
        ).collect()
        assert [r["doc"] for r in got] == ["d2"], neg
    # plan: a left-anti join, no Python
    import io
    from contextlib import redirect_stdout

    out = run_sparql(
        g, "SELECT ?doc WHERE { ?doc <type> <Doc> . "
           "MINUS { ?doc <publisher> ?pub . } }"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    assert "LeftAnti" in buf.getvalue()
    # negation sharing no variable: the two forms diverge (spec
    # §8.3.3) and both get their exact semantics — MINUS removes
    # nothing (no domain overlap), NOT EXISTS is all-or-nothing
    got = run_sparql(
        g, "SELECT ?doc WHERE { ?doc <type> <Doc> . "
           "MINUS { ?other <title> ?t . } }"
    ).collect()
    assert sorted(r["doc"] for r in got) == ["d1", "d2"]
    got = run_sparql(
        g, "SELECT ?doc WHERE { ?doc <type> <Doc> . "
           "FILTER NOT EXISTS { ?other <title> ?t . } }"
    ).collect()
    assert got == []  # some title exists -> every solution drops
    got = run_sparql(
        g, "SELECT ?doc WHERE { ?doc <type> <Doc> . "
           "FILTER NOT EXISTS { ?other <nosuchpred> ?t . } }"
    ).collect()
    assert sorted(r["doc"] for r in got) == ["d1", "d2"]


def test_values_lang_datatype(spark, g):
    """VALUES inline data (isin filter, pushed down) and the
    term-metadata filters lang()/datatype() over the carried
    _lang_/_dt_ companion columns."""
    got = run_sparql(
        g,
        """SELECT ?doc ?t WHERE {
             ?doc <title> ?t . VALUES ?doc { <d1> <d2> }
           }""",
    ).collect()
    assert {tuple(r) for r in got} == {("d1", "Alpha"), ("d2", "Beta")}
    got = run_sparql(
        g,
        """SELECT ?doc WHERE {
             ?doc <title> ?t . FILTER(lang(?t) = "sv")
           }""",
    ).collect()
    assert [r["doc"] for r in got] == ["d2"]
    got = run_sparql(
        g,
        """SELECT ?doc WHERE {
             ?doc <issued> ?d . FILTER(datatype(?d) = "xsd:gYearMonth")
           }""",
    ).collect()
    assert {r["doc"] for r in got} == {"d1", "d2"}
    # VALUES on an unbound variable is refused
    with pytest.raises(SparqlSyntaxError, match="VALUES"):
        run_sparql(
            g, "SELECT ?doc WHERE { ?doc <title> ?t . VALUES ?zz { <d1> } }"
        ).collect()


def test_optional_with_filter_and_numeric_compare(spark):
    """A FILTER inside an OPTIONAL scopes to the group (applied
    before the left join), and comparisons against bare numbers are
    numeric, not lexical ("9" < "10" numerically)."""
    rows = [
        ("d1", "http://p/score", "9", False, None, "xsd:integer"),
        ("d2", "http://p/score", "10", False, None, "xsd:integer"),
        ("d3", "http://p/score", "n/a", False, None, None),
        ("d1", "http://p/name", "One", False, None, None),
        ("d2", "http://p/name", "Two", False, None, None),
        ("d3", "http://p/name", "Three", False, None, None),
    ]
    g2 = spark.createDataFrame(rows, SCHEMA)
    # numeric: 10 > 9 even though "10" < "9" lexically; "n/a" drops
    got = run_sparql(
        g2,
        """SELECT ?s WHERE {
             ?s <http://p/score> ?v . FILTER(?v > 9)
           }""",
    ).collect()
    assert [r["s"] for r in got] == ["d2"]
    # group-scoped filter: every name survives; score only when > 9
    got = run_sparql(
        g2,
        """SELECT ?s ?v WHERE {
             ?s <http://p/name> ?n .
             OPTIONAL { ?s <http://p/score> ?v . FILTER(?v > 9) }
           }""",
    ).collect()
    assert {tuple(r) for r in got} == {
        ("d1", None), ("d2", "10"), ("d3", None)
    }


def test_bound_isliteral_strends_contains(spark, g):
    """The remaining common FILTER functions: BOUND over OPTIONAL
    NULLs, isLiteral via the uri metadata, STRENDS/CONTAINS mapped
    to the native string predicates."""
    # docs WITHOUT a publisher: BOUND is false on the OPTIONAL var
    got = run_sparql(
        g,
        """SELECT ?doc WHERE {
             ?doc <type> <Doc> .
             OPTIONAL { ?doc <publisher> ?pub . }
             FILTER(!BOUND(?pub))
           }""",
    ).collect()
    assert [r["doc"] for r in got] == ["d2"]
    # isLiteral: titles yes, publishers no
    assert run_sparql(
        g, "SELECT ?o WHERE { ?s <title> ?o . FILTER(isLiteral(?o)) }"
    ).count() == 3
    assert run_sparql(
        g, "SELECT ?o WHERE { ?s <publisher> ?o . FILTER(isLiteral(?o)) }"
    ).count() == 0
    # STRENDS / CONTAINS
    got = run_sparql(
        g,
        'SELECT ?t WHERE { ?s <title> ?t . FILTER(STRENDS(STR(?t), "pha")) }',
    ).collect()
    assert [r["t"] for r in got] == ["Alpha"]
    got = run_sparql(
        g,
        'SELECT ?t WHERE { ?s <title> ?t . FILTER(CONTAINS(STR(?t), "et")) }',
    ).collect()
    assert [r["t"] for r in got] == ["Beta"]


def test_group_by_aggregates(spark, g):
    """GROUP BY with projected aggregates: COUNT, GROUP_CONCAT with
    an explicit separator, and grouped keys project in SELECT-clause
    order."""
    got = run_sparql(
        g,
        """SELECT ?o (GROUP_CONCAT(?s; SEPARATOR=",") AS ?subs)
                     (COUNT(?s) AS ?n)
           WHERE { ?s <type> ?o } GROUP BY ?o""",
    ).collect()
    assert [tuple(r) for r in got] == [("Doc", "d1,d2", 2)]
    assert got[0].__fields__ == ["o", "subs", "n"]
    # per-subject triple counts, ordered by the aggregate alias
    got = run_sparql(
        g,
        """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 2""",
    ).collect()
    assert [tuple(r) for r in got] == [("d1", 4), ("d1#s1", 3)]


def test_global_aggregates(g):
    """Aggregates without GROUP BY form one implicit group; MIN/MAX
    use the engine's lexical term order, COUNT DISTINCT dedups,
    SAMPLE is the deterministic minimum."""
    got = run_sparql(
        g,
        """SELECT (COUNT(DISTINCT ?s) AS ?subs) (MIN(?t) AS ?lo)
                  (MAX(?t) AS ?hi) (SAMPLE(?t) AS ?pick)
           WHERE { ?s <title> ?t }""",
    ).collect()
    assert [tuple(r) for r in got] == [(3, "Alpha", "Intro", "Alpha")]


def test_numeric_aggregates_try_cast(spark):
    """SUM/AVG cast lexical terms numerically; a non-numeric member
    becomes NULL and is ignored (the engine's relational reading of
    SPARQL's type-error rule, same as FILTER comparisons)."""
    t = spark.createDataFrame(
        [
            ("a", "score", "3", False, None, None),
            ("a", "score", "5", False, None, None),
            ("a", "score", "oops", False, None, None),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    got = run_sparql(
        t, "SELECT (SUM(?v) AS ?total) (AVG(?v) AS ?mean) WHERE { ?s <score> ?v }"
    ).collect()
    assert [tuple(r) for r in got] == [(8.0, 4.0)]


def test_having_over_aggregate(g):
    """HAVING takes aggregate expressions (compiled to hidden agg
    columns and filtered after the groupBy)."""
    got = run_sparql(
        g,
        """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY ?s HAVING (COUNT(?o) >= 3) ORDER BY ?s""",
    ).collect()
    assert [tuple(r) for r in got] == [("d1", 4), ("d1#s1", 3), ("d2", 3)]


def test_group_by_without_aggregates(g):
    """GROUP BY with a plain projection is just the distinct keys."""
    got = run_sparql(
        g, "SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p"
    ).collect()
    assert [r["p"] for r in got] == [
        "issued", "partOf", "publisher", "references", "title", "type"
    ]


def test_aggregate_syntax_errors(g):
    """Spec §18.2.4: projected non-aggregate vars must be grouped;
    malformed aggregate clauses raise, never guess."""
    for bad in [
        # ?p projected but not grouped
        "SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s",
        # only COUNT takes *
        "SELECT (SUM(*) AS ?x) WHERE { ?s ?p ?o }",
        # missing AS ?alias
        "SELECT (COUNT(?o)) WHERE { ?s ?p ?o }",
        # HAVING over an ungrouped plain variable
        "SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)",
        # empty GROUP BY
        "SELECT (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY",
        # SEPARATOR outside GROUP_CONCAT
        'SELECT (COUNT(?o; SEPARATOR=",") AS ?n) WHERE { ?s ?p ?o }',
        # bare COUNT(*) mixed with GROUP BY
        "SELECT COUNT(*) WHERE { ?s ?p ?o } GROUP BY ?s",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_sequence_and_inverse_paths(g):
    """SPARQL 1.1 path sugar: a/b chains patterns through hidden
    fresh variables (dropped before projection), ^a swaps the
    pattern's endpoints, and both compose inside one path."""
    got = run_sparql(
        g, "SELECT ?sec ?t WHERE { ?sec <references>/<title> ?t }"
    ).collect()
    assert sorted(map(tuple, got)) == [("d1#s1", "Beta"), ("d2#s1", "Alpha")]
    got = run_sparql(
        g, "SELECT ?d ?x WHERE { ?d ^<partOf>/<references> ?x }"
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "d2"), ("d2", "d1")]
    # the hidden chain variables never leak into SELECT *
    star = run_sparql(g, "SELECT * WHERE { ?s <references>/<title> ?t }")
    assert star.columns == ["s", "t"]


def test_path_alternation_and_quantified_step(g):
    """a|b compiles to a UNION of branches; a quantified element
    inside a sequence keeps the bounded-closure compile."""
    got = run_sparql(
        g, "SELECT ?s ?t WHERE { ?s (<title>|<partOf>/<title>) ?t }"
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("d1", "Alpha"), ("d1#s1", "Alpha"), ("d1#s1", "Intro"),
        ("d2", "Beta"), ("d2#s1", "Beta"),
    ]
    got = run_sparql(
        g, "SELECT ?s ?t WHERE { ?s <partOf>*/<title> ?t }"
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("d1", "Alpha"), ("d1#s1", "Alpha"), ("d1#s1", "Intro"),
        ("d2", "Beta"), ("d2#s1", "Beta"),
    ]


def test_regex_and_langmatches_filters(g):
    """REGEX maps to RLIKE (flags folded in; q escapes the pattern);
    LANGMATCHES does RFC 4647 basic filtering over the captured
    language tags."""
    got = run_sparql(
        g, 'SELECT ?t WHERE { ?s <title> ?t . FILTER(REGEX(?t, "^alp", "i")) }'
    ).collect()
    assert [r["t"] for r in got] == ["Alpha"]
    # 'en' matches en and en-GB style subtags, not sv
    got = run_sparql(
        g,
        'SELECT ?t WHERE { ?s <title> ?t . '
        'FILTER(LANGMATCHES(LANG(?t), "en")) }',
    ).collect()
    assert sorted(r["t"] for r in got) == ["Alpha", "Intro"]
    got = run_sparql(
        g,
        'SELECT ?t WHERE { ?s <title> ?t . '
        'FILTER(LANGMATCHES(LANG(?t), "*")) }',
    ).collect()
    assert len(got) == 3


def test_two_sided_numeric_filter_tokenizes(g):
    """'?x < a && ?y > b' must lex as four operator tokens — the IRI
    rule must never swallow '< ... >' across spaces."""
    got = run_sparql(
        g,
        """SELECT ?s WHERE { ?s <issued> ?d . ?s <title> ?t .
           FILTER(?d > "1990" && ?d < "2010") }""",
    ).collect()
    assert sorted(r["s"] for r in got) == ["d1", "d2"]


def test_quantified_parenthesized_paths(g):
    """(a/b)+ / (a|b)* / (a/b){m,n}: bounded Kleene closure over the
    COMPOSED edge relation of the path body (closure_pairs over
    _alts_pairs) — not a per-element rewrite.  The doc graph's
    two-step citation walk ^partOf/references alternates d1 -> d2 ->
    d1 -> ..., so hop counts are directly observable."""
    # one composed hop reaches d2, two reach back to d1, capped at 3
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> (^<partOf>/<references>)+ ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]
    # {2}: exactly two composed hops
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> (^<partOf>/<references>){2} ?o }"
    ).collect()
    assert [r["o"] for r in got] == ["d1"]
    # {2,3}: two or three
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> (^<partOf>/<references>){2,3} ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]
    # alternation body: one hop over (partOf|references)
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1#s1> (<partOf>|<references>)+ ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]
    # zero-or-more with a ground endpoint includes the identity
    got = run_sparql(
        g, "SELECT ?o WHERE { <d2> (^<partOf>/<references>)* ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]
    # var-var zero-or-more with a bound endpoint: identity stays
    # algebraic (?o := ?s), closure pairs join on the bound side
    got = run_sparql(
        g,
        "SELECT ?s ?o WHERE { ?s <type> <Doc> . "
        "?s (^<partOf>/<references>)* ?o }",
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("d1", "d1"), ("d1", "d2"), ("d2", "d1"), ("d2", "d2"),
    ]
    # an element quantifier with lo >= 1 composes inside the body
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> (^<partOf>{1}/<references>)+ ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]


def test_quantified_parenthesized_path_refusals(g):
    for bad in [
        # zero-lower-bound elements inside a composed body would
        # need the store's node set as per-element identity
        "SELECT ?o WHERE { <d1> (<partOf>*/<references>)+ ?o }",
        "SELECT ?o WHERE { <d1> (<partOf>{,2}/<references>)+ ?o }",
        "SELECT ?o WHERE { <d1> (<partOf>{0,2}/<references>)+ ?o }",
        # variable predicates cannot form a scan-selective edge body
        "SELECT ?o WHERE { <d1> (?p/<references>)+ ?o }",
        # {0} / inverted bounds are malformed
        "SELECT ?o WHERE { <d1> (<a>/<b>){0} ?o }",
        "SELECT ?o WHERE { <d1> (<a>/<b>){3,2} ?o }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_projection_expressions(g):
    """SELECT (expr AS ?alias) (spec §18.2.4.2 Extend): compiled via
    the BIND translator and injected at the end of the WHERE group —
    exact Extend-then-project; alongside aggregation the expression
    may only use group keys / aggregate aliases (see
    test_aggregate_projection_expressions)."""
    got = run_sparql(
        g,
        "SELECT ?d (UCASE(?t) AS ?u) WHERE "
        "{ ?d <title> ?t . ?d <type> <Doc> }",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "ALPHA"), ("d2", "BETA")]
    got = run_sparql(
        g,
        'SELECT (CONCAT(?t, "/", ?y) AS ?k) WHERE '
        "{ ?d <title> ?t ; <issued> ?y }",
    ).collect()
    assert sorted(r["k"] for r in got) == ["Alpha/2004-01", "Beta/1999-06"]
    # inside a subquery: Extend applies before the outward join
    got = run_sparql(
        g,
        "SELECT ?u WHERE { { SELECT (UCASE(?t) AS ?u) "
        "WHERE { ?d <title> ?t } } }",
    ).collect()
    assert sorted(r["u"] for r in got) == ["ALPHA", "BETA", "INTRO"]
    for bad in [
        # aggregated SELECT: the expression references a var that is
        # neither a group key nor an aggregate alias
        "SELECT (COUNT(*) AS ?n) (STRLEN(?t) AS ?l) WHERE "
        "{ ?d <title> ?t }",
        # the alias must be fresh (spec: Extend requires unbound var)
        "SELECT (UCASE(?t) AS ?t) WHERE { ?d <title> ?t }",
        # AS ?alias is mandatory
        "SELECT (UCASE(?t)) WHERE { ?d <title> ?t }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_aggregate_projection_expressions(spark):
    """Projection expressions over aggregates (spec §18.2.4.2:
    Extend is applied AFTER Aggregation): aggregate calls inside the
    expression become hidden aggregate columns (the HAVING trick),
    the rest evaluates post-groupBy; group keys and earlier aliases
    are referencable, anything else is refused."""
    rows = []
    for s, vs in {"a": [1, 2, 3], "b": [10, 20]}.items():
        rows.append((f"urn:{s}", "urn:grp", s, False, None, None))
        for v in vs:
            rows.append((f"urn:{s}", "urn:val", str(v), False, None, None))
    g2 = spark.createDataFrame(rows, SCHEMA)
    body = "WHERE { ?s <urn:grp> ?k . ?s <urn:val> ?v }"

    got = run_sparql(
        g2,
        f"SELECT ?k (SUM(?v)/COUNT(?v) AS ?avg) (SUM(?v)+1 AS ?p) "
        f"{body} GROUP BY ?k ORDER BY ?k",
    ).collect()
    assert [tuple(r) for r in got] == [
        ("a", 2.0, 7.0), ("b", 15.0, 31.0)]

    # expr over a group key + chained reference to an earlier alias
    got = run_sparql(
        g2,
        f"SELECT ?k (COUNT(?v) AS ?n) (UCASE(?k) AS ?u) (?n+1 AS ?n1) "
        f"{body} GROUP BY ?k ORDER BY ?k",
    ).collect()
    assert [tuple(r) for r in got] == [
        ("a", 3, "A", 4.0), ("b", 2, "B", 3.0)]

    # implicit single group (no GROUP BY)
    got = run_sparql(
        g2, "SELECT (COUNT(?v)*2 AS ?y) WHERE { ?s <urn:val> ?v }"
    ).collect()
    assert [r["y"] for r in got] == [10.0]

    # IRI() around an aggregate expression: computed resource
    got = run_sparql(
        g2,
        f'SELECT ?k (IRI(CONCAT("urn:n/", STR(COUNT(?v)))) AS ?u) '
        f"{body} GROUP BY ?k ORDER BY ?k",
    ).collect()
    assert [tuple(r) for r in got] == [("a", "urn:n/3"), ("b", "urn:n/2")]

    # composes with HAVING (hidden _h and _pa aggregates coexist)
    got = run_sparql(
        g2,
        f"SELECT ?k (SUM(?v)*10 AS ?t) {body} "
        f"GROUP BY ?k HAVING (COUNT(?v) > 2)",
    ).collect()
    assert [tuple(r) for r in got] == [("a", 60.0)]

    # inside a subquery, joined outward on the group key
    got = run_sparql(
        g2,
        "SELECT ?k ?t WHERE { ?s <urn:grp> ?k . "
        "{ SELECT ?k (SUM(?v)+0.5 AS ?t) WHERE "
        "{ ?s2 <urn:grp> ?k . ?s2 <urn:val> ?v } GROUP BY ?k } } "
        "ORDER BY ?k",
    ).collect()
    assert [tuple(r) for r in got] == [("a", 6.5), ("b", 30.5)]

    # ORDER BY the expression alias (post-agg column exists)
    got = run_sparql(
        g2,
        f"SELECT ?k (SUM(?v)*1 AS ?t) {body} GROUP BY ?k "
        f"ORDER BY DESC(?t) LIMIT 1",
    ).collect()
    assert [tuple(r) for r in got] == [("b", 30.0)]

    for bad in [
        # non-group-key variable inside the expression
        f"SELECT ?k (?v+1 AS ?y) (COUNT(?v) AS ?n) {body} GROUP BY ?k",
        # rebinding a group key
        f"SELECT ?k (UCASE(?k) AS ?k) {body} GROUP BY ?k",
        # rebinding an aggregate alias
        f"SELECT (COUNT(?v) AS ?n) (SUM(?v) AS ?n) {body} GROUP BY ?k",
        # aggregates over expressions stay unsupported
        f"SELECT (SUM(?v+1) AS ?y) {body} GROUP BY ?k",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g2, bad)


def test_encode_for_uri_exact(spark):
    """ENCODE_FOR_URI: exact RFC 3986 percent-encoding per code
    point (uppercase hex of the UTF-8 bytes, unreserved chars pass)
    — checked against urllib.parse.quote, including multibyte and
    astral characters."""
    import urllib.parse

    vals = [
        "hello", "a b&c", "héllo/wörld", "x~-_.y", "100% legit",
        "emoji \U0001f600 end", "ümläut+plus", "",
    ]
    rows = [(f"s{k}", "val", v, False, None, None)
            for k, v in enumerate(vals)]
    g2 = spark.createDataFrame(rows, SCHEMA)
    got = run_sparql(
        g2,
        "SELECT ?v (ENCODE_FOR_URI(?v) AS ?e) WHERE { ?s <val> ?v }",
    ).collect()
    for r in got:
        assert r["e"] == urllib.parse.quote(r["v"], safe="-_.~"), r["v"]
    assert len(got) == len(set(vals))


def test_iri_constructor(g):
    """IRI()/URI() around a BIND or projection expression
    (spec §17.4.2.8): the computed term is a resource — isURI sees
    it and CONSTRUCT emits it with obj_is_uri, the SPARQL side of
    URI minting."""
    got = run_sparql(
        g,
        """CONSTRUCT { ?d <minted> ?m } WHERE {
          ?d <type> <Doc> .
          BIND(IRI(CONCAT("https://x.org/", ?d)) AS ?m)
        }""",
    ).collect()
    assert sorted((r["subj"], r["obj"], r["obj_is_uri"]) for r in got) == [
        ("d1", "https://x.org/d1", True),
        ("d2", "https://x.org/d2", True),
    ]
    got = run_sparql(
        g,
        'SELECT (URI(CONCAT("https://x.org/", ?d)) AS ?m) '
        "WHERE { ?d <type> <Doc> }",
    ).collect()
    assert sorted(r["m"] for r in got) == [
        "https://x.org/d1", "https://x.org/d2",
    ]
    # an un-wrapped computed term stays a literal
    got = run_sparql(
        g,
        'SELECT ?d WHERE { ?d <type> <Doc> . '
        'BIND(CONCAT("x", ?d) AS ?m) FILTER(!isURI(?m)) }',
    ).collect()
    assert sorted(r["d"] for r in got) == ["d1", "d2"]
    # IRI( must wrap the WHOLE expression to count as a constructor
    got = run_sparql(
        g,
        'SELECT ?d WHERE { ?d <type> <Doc> . '
        'BIND(CONCAT(STR(?d), "x") AS ?m) FILTER(!isURI(?m)) }',
    ).collect()
    assert sorted(r["d"] for r in got) == ["d1", "d2"]


def test_optional_exact_compat_left(g):
    """OPTIONAL is the exact spec §18.5 LeftJoin: a solution whose
    shared variable is unbound is compatible with EVERY body row
    (and takes its binding); nested OPTIONALs / UNIONs inside an
    OPTIONAL body compile recursively."""
    # chained OPTIONALs reusing a maybe-unbound variable: d2 has no
    # publisher, so ?p is unbound there and merges with every title
    got = run_sparql(
        g,
        """SELECT ?d ?p ?t WHERE {
          ?d <type> <Doc> .
          OPTIONAL { ?d <publisher> ?p }
          OPTIONAL { ?p <title> ?t }
        }""",
    ).collect()
    assert sorted(map(tuple, got), key=str) == [
        ("d1", "org1", None),
        ("d2", "d1#s1", "Intro"),
        ("d2", "d1", "Alpha"),
        ("d2", "d2", "Beta"),
    ]
    # nested OPTIONAL body
    got = run_sparql(
        g,
        """SELECT ?d ?p ?t WHERE {
          ?d <type> <Doc> .
          OPTIONAL { ?d <publisher> ?p OPTIONAL { ?d <title> ?t } }
        }""",
    ).collect()
    assert sorted(map(tuple, got), key=str) == [
        ("d1", "org1", "Alpha"), ("d2", None, None),
    ]
    # UNION inside an OPTIONAL body
    got = run_sparql(
        g,
        """SELECT ?d ?x WHERE {
          ?d <type> <Doc> .
          OPTIONAL { { ?d <publisher> ?x } UNION { ?d <issued> ?x } }
        }""",
    ).collect()
    assert sorted(map(tuple, got), key=str) == [
        ("d1", "2004-01"), ("d1", "org1"), ("d2", "1999-06"),
    ]
    # disjoint-domain OPTIONAL: the spec's cross-merge
    got = run_sparql(
        g,
        """SELECT ?d ?o WHERE {
          ?d <publisher> ?x .
          OPTIONAL { <d2> <issued> ?o }
        }""",
    ).collect()
    assert sorted(map(tuple, got), key=str) == [("d1", "1999-06")]


def test_negated_property_sets(g):
    """!iri / !(a|^b) (spec §9.1): a Not-In-pushed scan for forward
    members, an endpoint-swapped part for inverse members, and the
    spec's union for mixed sets; composes inside sequences and
    quantified bodies."""
    got = run_sparql(g, "SELECT ?o WHERE { <d1> !<type> ?o }").collect()
    assert sorted(r["o"] for r in got) == ["2004-01", "Alpha", "org1"]
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> !(<type>|<title>|<issued>) ?o }"
    ).collect()
    assert [r["o"] for r in got] == ["org1"]
    # mixed: forward non-title out of d1 plus reverse non-partOf into d1
    got = run_sparql(
        g, "SELECT ?o WHERE { <d1> !(<title>|^<partOf>) ?o }"
    ).collect()
    assert sorted(r["o"] for r in got) == ["2004-01", "Doc", "d2#s1", "org1"]
    # all-inverse set has no forward part at all (spec translation)
    got = run_sparql(
        g, "SELECT ?o WHERE { <d2> !(^<references>) ?o }"
    ).collect()
    assert [r["o"] for r in got] == ["d2#s1"]
    # inside a sequence and inside a quantified parenthesized body
    got = run_sparql(
        g,
        "SELECT ?s ?t WHERE { ?s !(<type>|<title>|<issued>|<publisher>"
        "|<references>)/<title> ?t }",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1#s1", "Alpha"), ("d2#s1", "Beta")]
    got = run_sparql(
        g,
        "SELECT ?o WHERE { <d1#s1> "
        "(!(<type>|<title>|<issued>|<publisher>))+ ?o }",
    ).collect()
    assert sorted(r["o"] for r in got) == ["d1", "d2"]
    # term metadata: a literal reached through an NPS keeps its tag
    got = run_sparql(
        g,
        'SELECT ?o WHERE { <d2> !<type> ?o . '
        'FILTER(LANGMATCHES(LANG(?o), "sv")) }',
    ).collect()
    assert [r["o"] for r in got] == ["Beta"]
    for bad in [
        "SELECT ?o WHERE { <d1> !(?p) ?o }",
        "SELECT ?o WHERE { <d1> !(<a>|<b> ?o }",
        "CONSTRUCT { ?s !<type> ?o } WHERE { ?s <title> ?o }",
        "SELECT ?o WHERE { <d1> !<type>{2,1} ?o }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_quantified_negated_property_sets(spark):
    """!(a|b)+ / !a* / !a{m,n} (spec §9.1 + §9.3 PathMod): a bounded
    Kleene closure over the complement edge relation — the same
    ("path", body, lo, hi) pipeline as quantified parenthesized
    paths, with the NPS scan as the single body step."""
    T = [("a", "x", "b"), ("b", "y", "c"), ("c", "knows", "d"),
         ("a", "knows", "e"), ("d", "x", "f")]
    g2 = spark.createDataFrame(
        [(s, p, o, True, None, None) for s, p, o in T], SCHEMA
    )
    got = run_sparql(
        g2, "SELECT ?a ?b WHERE { ?a !<knows>+ ?b }"
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("a", "b"), ("a", "c"), ("b", "c"), ("d", "f")]
    # exact hop count
    got = run_sparql(
        g2, "SELECT ?a ?b WHERE { ?a !<knows>{2,2} ?b }"
    ).collect()
    assert sorted(map(tuple, got)) == [("a", "c")]
    # zero-or-more with a ground endpoint includes the identity
    got = run_sparql(g2, "SELECT ?b WHERE { <a> !<knows>* ?b }").collect()
    assert sorted(r["b"] for r in got) == ["a", "b", "c"]
    # inverse of the whole quantified NPS
    got = run_sparql(
        g2, "SELECT ?a ?b WHERE { ?a ^!<knows>+ ?b }"
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("b", "a"), ("c", "a"), ("c", "b"), ("f", "d")]
    # nested: a quantified NPS as an element of a quantified body
    got = run_sparql(
        g2, "SELECT ?a ?b WHERE { ?a (!(<knows>|<y>)+/<y>)+ ?b }"
    ).collect()
    assert sorted(map(tuple, got)) == [("a", "c")]
    # multi-member set with an inverse member, quantified
    got = run_sparql(
        g2, "SELECT ?a ?b WHERE { ?a !(<x>|^<y>){1,1} ?b }"
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("a", "e"), ("b", "a"), ("b", "c"), ("c", "d"),
        ("d", "c"), ("e", "a"), ("f", "d")]


def test_path_syntax_errors(g):
    for bad in [
        # the rewrite's fresh-variable namespace is reserved
        "SELECT ?_pv0 WHERE { ?_pv0 <a> ?o }",
        # paths never emit triples
        "CONSTRUCT { ?a <x>/<y> ?b } WHERE { ?a <x> ?b }",
        "SELECT ?t WHERE { ?s <title> ?t . FILTER(REGEX(?t)) }",
        'SELECT ?t WHERE { ?s <title> ?t . FILTER(REGEX(?t, "p", "z")) }',
        'SELECT ?t WHERE { ?s <title> ?t . FILTER(LANGMATCHES(?t, "en")) }',
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_regex_invalid_pattern_raises_at_parse(g):
    """A syntactically broken regex must raise SparqlSyntaxError on
    the driver at parse time, never crash executor tasks mid-job."""
    with pytest.raises(SparqlSyntaxError, match="invalid REGEX"):
        run_sparql(
            g, 'SELECT ?t WHERE { ?s <title> ?t . FILTER(REGEX(?t, "[oops")) }'
        )


def test_subquery_aggregate_join(g):
    """Spec §12 subqueries: evaluated bottom-up against the dataset,
    aggregation/LIMIT applied BEFORE the outward join on projected
    variables."""
    got = run_sparql(
        g,
        """SELECT ?s ?t WHERE {
             ?s <title> ?t .
             { SELECT ?s WHERE { ?s <references> ?x } GROUP BY ?s
               HAVING (COUNT(?x) >= 1) }
           }""",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1#s1", "Intro")]
    # top-k subquery: the most-referenced doc and its title
    got = run_sparql(
        g,
        """SELECT ?d ?t ?n WHERE {
             ?d <title> ?t .
             { SELECT ?d (COUNT(?x) AS ?n) WHERE { ?x <references> ?d }
               GROUP BY ?d ORDER BY DESC(?n) ?d LIMIT 1 }
           }""",
    ).collect()
    assert [tuple(r) for r in got] == [("d1", "Alpha", 1)]


def test_ask_form(g):
    """ASK compiles to a lazy LIMIT-1 existence probe returning one
    boolean row; WHERE keyword is optional."""
    assert run_sparql(g, "ASK { ?s <references> ?o }").collect()[0]["ask"]
    assert not run_sparql(
        g, "ASK WHERE { ?s <nosuchpred> ?o }"
    ).collect()[0]["ask"]
    with pytest.raises(SparqlSyntaxError):
        run_sparql(g, "ASK { ?s <references> ?o } LIMIT 2")


def test_subquery_syntax_errors(g):
    for bad in [
        # truncated subquery
        "SELECT ?d WHERE { { SELECT ?d WHERE { ?d <a> ?x } ",
        # aggregated subquery still validates grouping
        "SELECT ?d WHERE { { SELECT ?d ?x (COUNT(?x) AS ?n) WHERE { ?d <a> ?x } GROUP BY ?d } }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_subquery_as_union_branch(g):
    """A UNION branch may be a subquery (spec: any branch is a
    GroupGraphPattern, which includes subselects): the subquery
    evaluates bottom-up — its LIMIT/aggregation applies BEFORE the
    union — then the branch merges like any other."""
    # branch 1: the single most-cited doc (grouped top-1 subquery);
    # branch 2: every doc with a publisher.  d1 and d2 cite each
    # other once each; MIN tie-break via ORDER BY makes it d1.
    got = run_sparql(
        g,
        """SELECT ?d WHERE {
          { SELECT ?d WHERE { ?x <references> ?d } ORDER BY ?d LIMIT 1 }
          UNION
          { ?d <publisher> ?p }
        }""",
    ).collect()
    assert sorted(r["d"] for r in got) == ["d1"]  # both branches give d1
    # subquery as a LATER branch, binding a different variable set
    got = run_sparql(
        g,
        """SELECT ?d ?t WHERE {
          { ?d <title> ?t . FILTER(LANGMATCHES(LANG(?t), "sv")) }
          UNION
          { SELECT ?d WHERE { ?d <publisher> ?p } }
        }""",
    ).collect()
    assert sorted((r["d"], r["t"]) for r in got) == [
        ("d1", None), ("d2", "Beta"),
    ]
    # the subquery's aggregate stays inside its branch
    got = run_sparql(
        g,
        """SELECT ?d ?n WHERE {
          { SELECT ?d (COUNT(?x) AS ?n)
            WHERE { ?x <references> ?d } GROUP BY ?d }
          UNION
          { ?d <type> <Doc> . }
        }""",
    ).collect()
    assert sorted(
        ((r["d"], r["n"]) for r in got),
        key=lambda p: (p[0], p[1] is not None, p[1] or 0),
    ) == [("d1", None), ("d1", 1), ("d2", None), ("d2", 1)]


def test_describe_form(g):
    """DESCRIBE returns the simple subject description in the engine
    triples schema: a pushed isin scan for ground IRIs, a semi-join
    for pattern-bound variables."""
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in run_sparql(g, "DESCRIBE <d2>").collect()
    }
    assert got == {
        ("d2", "type", "Doc"), ("d2", "title", "Beta"),
        ("d2", "issued", "1999-06"),
    }
    # variable form: describe whatever d1#s1 references (= d2)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in run_sparql(
            g, "DESCRIBE ?x WHERE { <d1#s1> <references> ?x }"
        ).collect()
    }
    assert {s for s, _, _ in got} == {"d2"} and len(got) == 3
    for bad in ["DESCRIBE", "DESCRIBE ?d", "DESCRIBE <d1> LIMIT 2",
                "DESCRIBE ?z WHERE { ?d <references> ?x }"]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_bind_expressions(g):
    """BIND(expr AS ?v): CONCAT/IF/COALESCE/UCASE/SUBSTR compile via
    the FILTER translator into plan-time Spark SQL expressions; the
    result is a plain computed literal usable by later FILTERs."""
    got = run_sparql(
        g,
        """SELECT ?s ?label WHERE { ?s <type> <Doc> . ?s <title> ?t .
           BIND(CONCAT(?s, ": ", ?t) AS ?label) }""",
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("d1", "d1: Alpha"), ("d2", "d2: Beta")
    ]
    got = run_sparql(
        g,
        """SELECT ?s ?v WHERE { ?s <type> <Doc> .
           OPTIONAL { ?s <publisher> ?p }
           BIND(COALESCE(?p, "none") AS ?v) }""",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "org1"), ("d2", "none")]
    # BIND output feeding a later FILTER in the same group
    got = run_sparql(
        g,
        """SELECT ?s WHERE { ?s <title> ?t . BIND(UCASE(?t) AS ?u) .
           FILTER(?u = "BETA") }""",
    ).collect()
    assert [r["s"] for r in got] == ["d2"]
    for bad in [
        # unbound reference, rebinding, missing AS
        "SELECT ?s WHERE { ?s <title> ?t . BIND(CONCAT(?nope) AS ?x) }",
        "SELECT ?s WHERE { ?s <title> ?t . BIND(UCASE(?t) AS ?t) }",
        "SELECT ?s WHERE { ?s <title> ?t . BIND(UCASE(?t) ?x) }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_strbefore_strafter_exact(g):
    """STRBEFORE/STRAFTER with SPARQL's exact edge semantics: missing
    separator yields "", empty separator yields ""/the whole string —
    the cases a bare substring_index mapping would get wrong."""
    got = run_sparql(
        g,
        'SELECT ?s ?b WHERE { ?s <issued> ?d . '
        'BIND(STRBEFORE(?d, "-") AS ?b) }',
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "2004"), ("d2", "1999")]
    got = run_sparql(
        g,
        'SELECT ?s ?b WHERE { ?s <issued> ?d . '
        'BIND(STRAFTER(?d, "-") AS ?b) }',
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "01"), ("d2", "06")]
    # missing separator -> "" (Spark substring_index would return ?d)
    got = run_sparql(
        g,
        'SELECT ?b WHERE { <d1> <issued> ?d . '
        'BIND(STRBEFORE(?d, "/") AS ?b) }',
    ).collect()
    assert [r["b"] for r in got] == [""]


def test_numeric_arithmetic(g):
    """Binary + - * / over TRY_CAST doubles; unary minus folds into
    numeric literals; non-numeric operands drop the row (FILTER) or
    yield NULL (BIND) — never an ANSI task failure."""
    got = run_sparql(
        g,
        'SELECT ?s WHERE { ?s <issued> ?d . '
        'BIND(STRBEFORE(?d, "-") AS ?y) . FILTER(?y + 1 > 2000) }',
    ).collect()
    assert [r["s"] for r in got] == ["d1"]
    got = run_sparql(
        g,
        'SELECT ?s WHERE { ?s <issued> ?d . '
        'BIND(STRBEFORE(?d, "-") AS ?y) . FILTER(?y - 2004 < -1) }',
    ).collect()
    assert [r["s"] for r in got] == ["d2"]
    # a non-numeric var in arithmetic: TRY_CAST -> NULL -> row drops
    got = run_sparql(
        g, "SELECT ?s WHERE { ?s <title> ?t . FILTER(?t * 2 > 0) }"
    ).collect()
    assert got == []


def test_values_table_form(g):
    """Multi-variable VALUES compiles to an explicit-broadcast inner
    join on the inline rows."""
    got = run_sparql(
        g,
        """SELECT ?s ?t WHERE { ?s <title> ?t .
           VALUES (?s ?t) { (<d1> "Alpha") (<d2> "WRONG") } }""",
    ).collect()
    assert [tuple(r) for r in got] == [("d1", "Alpha")]
    for bad in [
        'SELECT ?s WHERE { ?s <title> ?t . VALUES (?s ?t) { (<d1> UNDEF) } }',
        'SELECT ?s WHERE { ?s <title> ?t . VALUES (?s ?t) { (<d1>) } }',
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_sparql(g, bad)


def test_values_over_maybe_unbound_var(g):
    """VALUES over an OPTIONAL-bound variable: exact compatible-merge
    (spec §10.2) — a solution with the var unbound is compatible
    with EVERY inline value and takes each one; bound solutions
    filter as usual.  Filled values carry their term metadata."""
    # d1 has publisher org1; d2 has none.  (d2, NULL) multiplies by
    # the whole list; (d1, org1) survives only as itself.
    got = run_sparql(
        g,
        """SELECT ?d ?p WHERE {
          ?d <type> <Doc> .
          OPTIONAL { ?d <publisher> ?p }
          VALUES ?p { <org1> <org2> }
        }""",
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("d1", "org1"), ("d2", "org1"), ("d2", "org2"),
    ]
    # a filled-in IRI value must pass isURI (term metadata is
    # rewritten along with the value), a filled-in literal must not
    got = run_sparql(
        g,
        """SELECT ?d ?p WHERE {
          ?d <type> <Doc> .
          OPTIONAL { ?d <publisher> ?p }
          VALUES ?p { <org1> "plain" }
          FILTER(isURI(?p))
        }""",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "org1"), ("d2", "org1")]
    # table form with one maybe-unbound column: row-aligned merge
    got = run_sparql(
        g,
        """SELECT ?d ?p WHERE {
          ?d <type> <Doc> .
          OPTIONAL { ?d <publisher> ?p }
          VALUES (?d ?p) { (<d1> <org1>) (<d2> <orgX>) (<d1> <orgZ>) }
        }""",
    ).collect()
    assert sorted(map(tuple, got)) == [("d1", "org1"), ("d2", "orgX")]


def test_filter_exists_positive(g):
    """FILTER EXISTS: a left-semi join on shared variables; with a
    disjoint domain it is an all-or-nothing 1-row probe."""
    got = run_sparql(
        g,
        """SELECT ?s WHERE { ?s <type> <Doc> .
           FILTER EXISTS { ?x <references> ?s } }""",
    ).collect()
    assert sorted(r["s"] for r in got) == ["d1", "d2"]
    got = run_sparql(
        g,
        """SELECT ?s WHERE { ?s <type> <Doc> .
           FILTER EXISTS { ?s <publisher> ?p } }""",
    ).collect()
    assert [r["s"] for r in got] == ["d1"]
    # disjoint domain: keep all iff the group matches at all
    assert run_sparql(
        g,
        "SELECT ?s WHERE { ?s <type> <Doc> . "
        "FILTER EXISTS { ?z <partOf> ?w } }",
    ).count() == 2
    assert run_sparql(
        g,
        "SELECT ?s WHERE { ?s <type> <Doc> . "
        "FILTER EXISTS { ?z <nope> ?w } }",
    ).count() == 0


def test_division_and_unary_minus_ansi_safe(spark):
    """Division compiles to try_divide (Spark ANSI raises
    DIVIDE_BY_ZERO even over doubles): x/0 makes the comparison NULL
    and the row drops — never a task failure.  Unary minus negates
    over a TRY_CAST double."""
    t = spark.createDataFrame(
        [
            ("a", "p", "1.5", False, None, None),
            ("b", "p", "-2.5", False, None, None),
            ("c", "p", "0", False, None, None),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    assert run_sparql(
        t, "SELECT ?s WHERE { ?s <p> ?v . FILTER(?v / 0 > 1) }"
    ).count() == 0
    got = run_sparql(
        t, "SELECT ?s WHERE { ?s <p> ?v . FILTER(3 / ?v > 1) }"
    ).collect()
    assert [r["s"] for r in got] == ["a"]
    got = run_sparql(
        t, "SELECT ?s WHERE { ?s <p> ?v . FILTER(- ?v > 1) }"
    ).collect()
    assert [r["s"] for r in got] == ["b"]
    with pytest.raises(SparqlSyntaxError):
        run_sparql(t, "SELECT ?s WHERE { ?s <p> ?v . FILTER(?v / 2 / 2 > 0) }")


def test_hash_functions(g):
    """MD5/SHA1/SHA256/SHA384/SHA512 (spec §17.4.4): both engines
    hash the UTF-8 bytes and print lowercase hex; checked against
    hashlib digests of the fixture title."""
    import hashlib

    got = run_sparql(
        g,
        """SELECT ?h5 ?h1 ?h2 ?h3 ?h4 WHERE { <d1> <title> ?t .
           BIND(MD5(?t) AS ?h5) BIND(SHA1(?t) AS ?h1)
           BIND(SHA256(?t) AS ?h2) BIND(SHA384(?t) AS ?h3)
           BIND(SHA512(?t) AS ?h4) }""",
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["h5"] == hashlib.md5(b"Alpha").hexdigest()
    assert r["h1"] == hashlib.sha1(b"Alpha").hexdigest()
    assert r["h2"] == hashlib.sha256(b"Alpha").hexdigest()
    assert r["h3"] == hashlib.sha384(b"Alpha").hexdigest()
    assert r["h4"] == hashlib.sha512(b"Alpha").hexdigest()


def test_sameterm_filter(g):
    """sameTerm (spec §17.4.1.8) compares the full term identity —
    value AND kind AND language tag AND datatype — where plain `=`
    compares only the lexical value.  The fixture's two 'Intro'/
    'Alpha' titles differ: d1's title is "Alpha"@en; a literal with
    the same value but another tag is NOT the same term."""
    tagged = g.sparkSession.createDataFrame(
        [
            ("x1", "label", "Same", False, "en", None),
            ("x2", "label", "Same", False, "sv", None),
            ("x3", "label", "Same", False, "en", None),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    got = run_sparql(
        tagged,
        """SELECT ?a ?b WHERE { ?a <label> ?la . ?b <label> ?lb .
           FILTER(sameTerm(?la, ?lb) && ?a < ?b) }""",
    ).collect()
    # only the en/en pair survives; value-equality would give 3 pairs
    assert sorted(map(tuple, got)) == [("x1", "x3")]
    # var-vs-ground-IRI form; subject-position vars are IRIs
    got = run_sparql(
        g, "SELECT ?s WHERE { ?s <type> <Doc> . FILTER(sameTerm(?s, <d1>)) }"
    ).collect()
    assert [r["s"] for r in got] == ["d1"]
    # an IRI and a literal with the same lexical value are different terms
    got = run_sparql(
        g,
        """SELECT ?s WHERE { ?s <type> <Doc> . FILTER(sameTerm(?s, "d1")) }""",
    ).collect()
    assert got == []


def test_isnumeric_isblank(g):
    """isNumeric is the TRY_CAST relational reading (lexical form
    parses as a number, term is a literal); isBlank is constant
    false — the engine skolemizes every node to a minted IRI.  Both
    propagate NULL for a maybe-unbound var so the row still drops
    under NOT."""
    t = g.sparkSession.createDataFrame(
        [
            ("a", "v", "42", False, None, None),
            ("b", "v", "4.5", False, None, None),
            ("c", "v", "x42", False, None, None),
            ("d", "v", "42", True, None, None),  # IRI, not numeric
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    got = run_sparql(
        t, "SELECT ?s WHERE { ?s <v> ?o . FILTER(isNumeric(?o)) }"
    ).collect()
    assert sorted(r["s"] for r in got) == ["a", "b"]
    got = run_sparql(
        t, "SELECT ?s WHERE { ?s <v> ?o . FILTER(!isNumeric(?o)) }"
    ).collect()
    assert sorted(r["s"] for r in got) == ["c", "d"]
    assert run_sparql(
        t, "SELECT ?s WHERE { ?s <v> ?o . FILTER(isBlank(?o)) }"
    ).count() == 0
    # unbound (OPTIONAL miss) is a type error: drops under BOTH signs
    q = """SELECT ?s WHERE { ?s <v> ?o . OPTIONAL { ?s <w> ?m }
           FILTER(%sisNumeric(?m)) }"""
    assert run_sparql(t, q % "").count() == 0
    assert run_sparql(t, q % "!").count() == 0


def test_datetime_accessors(g):
    """YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ (spec §17.4.5) with
    exact literal-clock semantics: the offset is stripped before the
    cast (never normalized to session time), TZ reads the suffix off
    the lexical form, SECONDS keeps the fraction, and the engine
    extension pads gYear/gYearMonth ('2004', '2004-01') so the
    corpus' dcterms:issued shapes work."""
    t = g.sparkSession.createDataFrame(
        [
            ("a", "at", "2011-01-10T14:45:13.815-05:00", False, None, None),
            ("b", "at", "2004-01", False, None, None),
            ("c", "at", "1999", False, None, None),
            ("d", "at", "not a date", False, None, None),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    got = run_sparql(
        t,
        """SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tz WHERE { ?s <at> ?x .
           BIND(YEAR(?x) AS ?y) BIND(MONTH(?x) AS ?mo)
           BIND(DAY(?x) AS ?d) BIND(HOURS(?x) AS ?h)
           BIND(MINUTES(?x) AS ?mi) BIND(SECONDS(?x) AS ?sec)
           BIND(TZ(?x) AS ?tz) }""",
    ).collect()
    rows = {r["s"]: r for r in got}
    a = rows["a"]
    assert (a["y"], a["mo"], a["d"], a["h"], a["mi"]) == (
        "2011", "1", "10", "14", "45",
    )
    assert a["sec"] == "13.815" and a["tz"] == "-05:00"
    assert (rows["b"]["y"], rows["b"]["mo"], rows["b"]["tz"]) == (
        "2004", "1", "",
    )
    assert rows["c"]["y"] == "1999"
    assert rows["d"]["y"] is None  # type error -> unbound
    # a malformed lexical form drops when the accessor feeds a FILTER
    assert run_sparql(
        t, "SELECT ?s WHERE { ?s <at> ?x . FILTER(YEAR(?x) > 1990) }"
    ).count() == 3


def test_not_in(g):
    """?x NOT IN (...) (spec §17.4.1.10)."""
    got = run_sparql(
        g,
        "SELECT ?s WHERE { ?s <type> <Doc> . FILTER(?s NOT IN (<d1>, <dX>)) }",
    ).collect()
    assert [r["s"] for r in got] == ["d2"]


def test_sameterm_tagged_literal_constant(g):
    """A ground literal operand carries its @lang / ^^dt into the
    term identity: sameTerm(?la, "Same"@en) matches ONLY the @en
    row, and the bare "Same" matches none of the tagged rows
    (spec §17.4.1.8 — a tagged literal is not the plain literal)."""
    tagged = g.sparkSession.createDataFrame(
        [
            ("x1", "label", "Same", False, "en", None),
            ("x2", "label", "Same", False, "sv", None),
            ("x3", "label", "Same", False, None,
             "http://www.w3.org/2001/XMLSchema#token"),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    got = run_sparql(
        tagged,
        'SELECT ?a WHERE { ?a <label> ?l . FILTER(sameTerm(?l, "Same"@en)) }',
    ).collect()
    assert [r["a"] for r in got] == ["x1"]
    got = run_sparql(
        tagged,
        'SELECT ?a WHERE { ?a <label> ?l . FILTER(sameTerm(?l, "Same")) }',
    ).collect()
    assert got == []
    got = run_sparql(
        tagged,
        """SELECT ?a WHERE { ?a <label> ?l . FILTER(sameTerm(?l,
           "Same"^^<http://www.w3.org/2001/XMLSchema#token>)) }""",
    ).collect()
    assert [r["a"] for r in got] == ["x3"]


def test_sameterm_unbound_is_error_under_negation(g):
    """An unbound sameTerm operand is a SPARQL type error; an error
    under ! is STILL an error, so the row drops for both
    FILTER(sameTerm(...)) and FILTER(!sameTerm(...)) — the NULL must
    survive the metadata coalesce legs."""
    # d2 has no <publisher>: ?pub is unbound for it under OPTIONAL
    q = """SELECT ?d WHERE {
        ?d <type> <Doc> .
        OPTIONAL { ?d <publisher> ?pub }
        FILTER(%(neg)ssameTerm(?pub, <org1>))
    }"""
    pos = run_sparql(g, q % {"neg": ""}).collect()
    assert [r["d"] for r in pos] == ["d1"]
    neg = run_sparql(g, q % {"neg": "!"}).collect()
    # d2's unbound ?pub is a type error, NOT a negated false:
    # neither branch keeps it
    assert [r["d"] for r in neg] == []


# ----------------------------------------------------- named graphs


QUAD_SCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "lang string, datatype string, graph string"
)

QUAD_ROWS = [
    ("d1", "title", "Doc One", False, None, None, "g:a"),
    ("d1", "cites", "d2", True, None, None, "g:a"),
    ("d2", "title", "Doc Two", False, None, None, "g:b"),
    ("d2", "cites", "d3", True, None, None, "g:b"),
    ("d3", "title", "Doc Three", False, None, None, "g:c"),
    # cross-graph noise: a cites in g:c whose subject's title lives
    # in g:a — a same-graph join must NOT match these up
    ("d1", "cites", "d3", True, None, None, "g:c"),
]


@pytest.fixture(scope="module")
def quads(spark):
    return spark.createDataFrame(QUAD_ROWS, QUAD_SCHEMA)


def test_graph_var_binds_and_aggregates(quads):
    got = run_sparql(
        quads,
        """SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
           GROUP BY ?g ORDER BY ?g""",
    ).collect()
    assert [(r["g"], r["n"]) for r in got] == [
        ("g:a", 2), ("g:b", 2), ("g:c", 2)
    ]


def test_graph_var_same_graph_join(quads):
    """Both patterns inside one GRAPH ?g block must match within a
    single graph: d1's g:c cites-row has no g:c title, so only the
    co-located (title, cites) pairs survive."""
    got = run_sparql(
        quads,
        """SELECT ?g ?s ?o WHERE {
             GRAPH ?g { ?s <title> ?t . ?s <cites> ?o } } ORDER BY ?s""",
    ).collect()
    assert [(r["g"], r["s"], r["o"]) for r in got] == [
        ("g:a", "d1", "d2"),
        ("g:b", "d2", "d3"),
    ]


def test_graph_var_joins_outside_block(quads):
    """?g and ?o flow out of the GRAPH block and join onto a
    default-graph pattern like any other variables."""
    got = run_sparql(
        quads,
        """SELECT ?g ?o WHERE {
             GRAPH ?g { ?s <cites> ?o } . ?o <title> ?t
           } ORDER BY ?g ?o""",
    ).collect()
    assert [(r["g"], r["o"]) for r in got] == [
        ("g:a", "d2"), ("g:b", "d3"), ("g:c", "d3")
    ]


def test_from_named_restricts_graph_var(quads):
    got = run_sparql(
        quads,
        """SELECT ?g ?s FROM NAMED <g:b> WHERE {
             GRAPH ?g { ?s <title> ?t } }""",
    ).collect()
    assert [(r["g"], r["s"]) for r in got] == [("g:b", "d2")]


def test_graph_constant_still_scopes(quads):
    got = run_sparql(
        quads, "SELECT ?s WHERE { GRAPH <g:a> { ?s <title> ?t } }"
    ).collect()
    assert [r["s"] for r in got] == ["d1"]


def test_graph_var_single_graph_store_raises(g):
    with pytest.raises(SparqlSyntaxError, match="multi-graph"):
        run_sparql(g, "SELECT ?gr WHERE { GRAPH ?gr { ?s ?p ?o } }")


def test_graph_var_path_unsupported(quads):
    with pytest.raises(ValueError, match="property paths"):
        run_sparql(
            quads, "SELECT ?g WHERE { GRAPH ?g { ?s <cites>+ ?o } }"
        ).collect()
