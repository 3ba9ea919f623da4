"""Turtle reader/writer: grammar coverage, round-trips, and a
differential pass over the reference's entire shipped .ttl corpus
(vocabularies + test datasets).  Reference parity: rdflib's turtle
parser/serializer as used by resourceloader/triplestore and
devel.py dumpstore (see operators/turtle.py module doc)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
    parse_turtle_docs,
    parse_turtle_text,
    read_turtle,
    to_turtle,
    turtle_header,
    write_turtle,
)

VOCAB_DIR = "/root/reference/ferenda/res/vocab"
DATASET_DIR = "/root/reference/test/files/datasets"


# ---------------------------------------------------------------- grammar


def test_basic_statement_forms():
    t = parse_turtle_text(
        """
        @prefix ex: <http://ex.org/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:s a ex:Klass ;
            ex:name "plain", "tagged"@sv ;
            ex:num "5"^^xsd:integer ;
            ex:ref <http://other.org/x> .
        """,
        "sc",
    )
    assert ("http://ex.org/s", RDF_TYPE, "http://ex.org/Klass", True, None, None) in t
    assert ("http://ex.org/s", "http://ex.org/name", "plain", False, None, None) in t
    assert ("http://ex.org/s", "http://ex.org/name", "tagged", False, "sv", None) in t
    assert (
        "http://ex.org/s", "http://ex.org/num", "5", False, None,
        XSD + "integer",
    ) in t
    assert ("http://ex.org/s", "http://ex.org/ref", "http://other.org/x", True, None, None) in t
    assert len(t) == 5


def test_sparql_style_directives_and_base():
    t = parse_turtle_text(
        """
        PREFIX ex: <http://ex.org/>
        BASE <http://base.org/dir/>
        <rel> ex:p <../up> .
        """,
        "sc",
    )
    assert t == [
        ("http://base.org/dir/rel", "http://ex.org/p", "http://base.org/up", True, None, None)
    ]


def test_numeric_and_boolean_shorthand():
    t = parse_turtle_text(
        "@prefix e: <u:> . e:s e:i 42 ; e:d 3.14 ; e:e 1e3 ; e:n -7 ; e:t true ; e:f false .",
        "sc",
    )
    by_pred = {p.split(":")[-1]: (o, dt) for _, p, o, _, _, dt in t}
    assert by_pred["i"] == ("42", XSD + "integer")
    assert by_pred["d"] == ("3.14", XSD + "decimal")
    assert by_pred["e"] == ("1e3", XSD + "double")
    assert by_pred["n"] == ("-7", XSD + "integer")
    assert by_pred["t"] == ("true", XSD + "boolean")
    assert by_pred["f"] == ("false", XSD + "boolean")


def test_long_strings_and_escapes():
    t = parse_turtle_text(
        '@prefix e: <u:> .\n'
        'e:s e:a """multi\nline ""quotes"" kept""" ;\n'
        "     e:b 'single' ;\n"
        "     e:c '''x''' ;\n"
        'e:d "tab\\there \\u00e5 \\U0001F600" .',
        "sc",
    )
    vals = {p[-1]: o for _, p, o, _, _, _ in t}
    assert vals["a"] == 'multi\nline ""quotes"" kept'
    assert vals["b"] == "single"
    assert vals["c"] == "x"
    assert vals["d"] == "tab\there å \U0001F600"


def test_blank_nodes_labeled_anon_and_nested():
    t = parse_turtle_text(
        """
        @prefix e: <u:> .
        _:x e:p _:y .
        e:s e:q [ e:r [ e:deep "v" ] ; e:flat "w" ] .
        e:t e:empty [] .
        """,
        "sc",
    )
    assert ("urn:bnode:sc:x", "u:p", "urn:bnode:sc:y", True, None, None) in t
    # nested bnodes produce a two-hop chain ending in literals
    deep = [r for r in t if r[2] == "v"][0]
    mid = [r for r in t if r[2] == deep[0]][0]
    top = [r for r in t if r[2] == mid[0]][0]
    assert top[0] == "u:s" and top[1] == "u:q"
    flat = [r for r in t if r[2] == "w"][0]
    assert flat[0] == mid[0]
    empty = [r for r in t if r[1] == "u:empty"][0]
    assert empty[2].startswith("urn:bnode:sc:anon")


def test_collections():
    t = parse_turtle_text(
        '@prefix e: <u:> . e:s e:list ("a" "b") ; e:nil () .',
        "sc",
    )
    nil = [r for r in t if r[1] == "u:nil"][0]
    assert nil[2] == RDF_NIL
    head = [r for r in t if r[1] == "u:list"][0][2]
    firsts = {r[0]: r[2] for r in t if r[1] == RDF_FIRST}
    rests = {r[0]: r[2] for r in t if r[1] == RDF_REST}
    assert firsts[head] == "a"
    assert firsts[rests[head]] == "b"
    assert rests[rests[head]] == RDF_NIL


def test_bnode_subject_property_list():
    t = parse_turtle_text(
        '@prefix e: <u:> . [ e:p "v" ] e:q "w" .',
        "sc",
    )
    assert len(t) == 2
    assert t[0][0] == t[1][0]


def test_pn_local_escapes_and_percent():
    t = parse_turtle_text(
        "@prefix e: <u:> . e:a\\.b e:p e:x%20y .",
        "sc",
    )
    assert t == [("u:a.b", "u:p", "u:x%20y", True, None, None)]


def test_strict_errors():
    for bad in [
        "e:s e:p e:o .",  # undeclared prefix
        '@prefix e: <u:> . e:s e:p "unterminated .',
        "@prefix e: <u:> . e:s e:p ",  # missing object + dot
        '@prefix e: <u:> . e:s e:p "x" ',  # missing final dot
    ]:
        with pytest.raises(ValueError):
            parse_turtle_text(bad, "sc")


def test_comments_and_trailing_semicolon():
    t = parse_turtle_text(
        "# leading comment\n"
        '@prefix e: <u:> . # trailing\n'
        'e:s e:p "v" ; . # statement done\n',
        "sc",
    )
    assert t == [("u:s", "u:p", "v", False, None, None)]


# ---------------------------------------------------------- reference corpus


@pytest.mark.skipif(not os.path.isdir(VOCAB_DIR), reason="reference absent")
def test_reference_ttl_corpus_parses():
    """Every .ttl the reference ships parses with plausible triple
    counts (statement separators as a lower bound is too loose —
    assert exact counts recorded from a verified manual run, so a
    parser regression shows up as a diff, not a crash)."""
    expected = {
        "bibo.ttl": 878, "dc.ttl": 138, "dcterms.ttl": 866,
        "foaf.ttl": 620, "prov.ttl": 961, "rdf.ttl": 85,
        "rdfs.ttl": 87, "schema.ttl": 7472, "skos.ttl": 252,
    }
    for name, want in expected.items():
        with open(os.path.join(VOCAB_DIR, name)) as fh:
            got = len(parse_turtle_text(fh.read(), "sc"))
        assert got == want, f"{name}: {got} != {want}"


@pytest.mark.skipif(not os.path.isdir(DATASET_DIR), reason="reference absent")
def test_reference_dataset_values():
    with open(os.path.join(DATASET_DIR, "movies.ttl")) as fh:
        t = parse_turtle_text(fh.read(), "sc")
    assert (
        "http://example.org/movies/tt0117665", RDF_TYPE,
        "http://schema.org/Movie", True, None, None,
    ) in t
    assert (
        "http://example.org/movies/tt0117665", "http://schema.org/name",
        "Kardeş Gibiydiler", False, "tr", None,
    ) in t
    assert (
        "http://example.org/movies/tt0117665",
        "http://schema.org/datePublished",
        "1996-10-18", False, None, XSD + "date",
    ) in t


# ------------------------------------------------------------- round-trips


def _sample_triples(spark):
    rows = [
        ("http://ex.org/d1", RDF_TYPE, "http://ex.org/Doc", True, None, None),
        ("http://ex.org/d1", "http://purl.org/dc/terms/title",
         'Qu"ote \\ back\nnl', False, "sv", None),
        ("http://ex.org/d1", "http://purl.org/dc/terms/issued",
         "2020-01-01", False, None, XSD + "date"),
        ("http://ex.org/d1", "http://ex.org/ref", "http://ex.org/d2", True, None, None),
        ("http://ex.org/d2", "http://purl.org/dc/terms/title",
         "plain", False, None, None),
        # IRI whose local name is NOT pname-safe: must stay <full>
        ("http://ex.org/d2", "http://ex.org/ref",
         "http://ex.org/weird/(paren)", True, None, None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string"
    )


PREFIXES = {
    "ex": "http://ex.org/",
    "dct": "http://purl.org/dc/terms/",
    "xsd": XSD,
}


def test_roundtrip_through_blocks(spark):
    """to_turtle blocks (full-IRI, self-contained) parse back to the
    exact triple set — the distributed dump contract."""
    t = _sample_triples(spark)
    blocks = to_turtle(t, None)
    back = parse_turtle_docs(blocks, "block")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_roundtrip_single_file_with_prefixes(spark, tmp_path):
    t = _sample_triples(spark)
    path = str(tmp_path / "out.ttl")
    write_turtle(t, path, PREFIXES, single_file=True)
    # header present and first
    import glob as g

    part = sorted(g.glob(path + "/part-*"))[0]
    text = open(part).read()
    assert text.startswith("@prefix dct: <http://purl.org/dc/terms/> .")
    assert "dct:title" in text and "ex:d1" in text
    assert "<http://ex.org/weird/(paren)>" in text  # unsafe local stays full
    back = read_turtle(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))


def test_multifile_dump_is_prefix_free(spark, tmp_path):
    t = _sample_triples(spark).repartition(3)
    path = str(tmp_path / "dump.ttl")
    write_turtle(t, path, PREFIXES, single_file=False)
    import glob as g

    texts = [open(p).read() for p in g.glob(path + "/part-*")]
    assert all("@prefix" not in x for x in texts)
    back = read_turtle(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, _sample_triples(spark).collect())
    )


def test_serializer_comma_and_semicolon_grouping(spark):
    t = _sample_triples(spark)
    block = (
        to_turtle(t, PREFIXES)
        .filter(F.col("block").startswith("ex:d1"))
        .collect()[0]["block"]
    )
    assert " ;\n    " in block
    assert block.rstrip().endswith(".")
    assert block.count("ex:d1") == 1  # subject emitted once


def test_rdf_type_shortens_to_a(spark):
    t = _sample_triples(spark)
    block = (
        to_turtle(t, PREFIXES)
        .filter(F.col("block").startswith("ex:d1"))
        .collect()[0]["block"]
    )
    assert "a ex:Doc" in block


@pytest.mark.skipif(not os.path.isdir(VOCAB_DIR), reason="reference absent")
def test_vocab_reparse_roundtrip(spark, tmp_path):
    """Parse a reference vocabulary distributedly, re-serialize with
    our writer, re-parse: triple set identical (idempotence over a
    real 866-triple ontology, bnodes excluded — skolem labels are
    load-scoped by contract)."""
    src = read_turtle(spark, os.path.join(VOCAB_DIR, "dcterms.ttl"))
    path = str(tmp_path / "dct.ttl")
    write_turtle(src, path, {"xsd": XSD}, single_file=True)
    again = read_turtle(spark, path)
    a = sorted(map(tuple, src.filter(~F.col("subj").startswith("urn:bnode")).collect()))
    b = sorted(map(tuple, again.filter(~F.col("subj").startswith("urn:bnode")).collect()))
    assert a == b and len(a) > 800


def test_parser_plan_is_per_file(spark):
    """parse_turtle_docs is one mapInPandas over the doc rows — the
    parse itself introduces no shuffle (per-file parallelism)."""
    docs = spark.createDataFrame(
        [('@prefix e: <u:> . e:s e:p "v" .',)], "doc string"
    )
    plan = (
        parse_turtle_docs(docs, "doc")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_integer_followed_by_statement_dot():
    """W3C grammar: DECIMAL requires digits after the dot, so
    '1.' is the integer 1 + the statement terminator."""
    t = parse_turtle_text("@prefix e: <u:> . e:s e:p 1.", "sc")
    assert t == [("u:s", "u:p", "1", False, None, XSD + "integer")]
    # double WITH exponent may keep the bare dot
    t2 = parse_turtle_text("@prefix e: <u:> . e:s e:p 1.e3 .", "sc")
    assert t2[0][2] == "1.e3" and t2[0][5] == XSD + "double"


def test_repeated_semicolons_allowed():
    """(';' (verb objectList)?)* permits empty slots."""
    t = parse_turtle_text(
        "@prefix e: <u:> . e:s e:p e:o ; ; e:q e:r .", "sc"
    )
    assert ("u:s", "u:p", "u:o", True, None, None) in t
    assert ("u:s", "u:q", "u:r", True, None, None) in t
    assert len(t) == 2


def test_uri_literal_twin_triples_both_survive(spark):
    """A URI object and an identical-string literal object are
    DISTINCT triples: the serializer dedup must key on obj_is_uri."""
    rows = [
        ("http://ex.org/s", "http://ex.org/p", "http://x.org/", True, None, None),
        ("http://ex.org/s", "http://ex.org/p", "http://x.org/", False, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, lang string, datatype string",
    )
    back = parse_turtle_docs(to_turtle(t), "block")
    assert sorted(map(tuple, back.collect())) == sorted(rows)
