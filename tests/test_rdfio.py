"""N-Triples bulk serialize/parse (rdfio) — reference parity for
`devel.py dumpstore nt` (devel.py:787-805) and the triplestore
bulk-load direction (S6)."""

import pyspark.sql.functions as F
import pytest

from ferenda_spark.operators.rdfio import (
    read_ntriples,
    parse_ntriples,
    to_ntriples,
    write_ntriples,
)

#: (subj, pred, obj, obj_is_uri, lang, datatype) covering every
#: escape and term shape the serializer must handle
NASTY = [
    ("http://x/a", "http://x/p", "plain", False, None, None),
    ("http://x/a", "http://x/p", "http://x/b", True, None, None),
    ("http://x/a", "http://x/p", 'quote " inside', False, None, None),
    ("http://x/a", "http://x/p", "back\\slash", False, None, None),
    ("http://x/a", "http://x/p", "line\nbreak\r\ttab", False, None, None),
    ("http://x/a", "http://x/p", "tricky \\n literal-backslash-n", False, None, None),
    ("http://x/a", "http://x/p", 'all \\ " \n \r \t mixed \\\\ two', False, None, None),
    ("http://x/a", "http://x/p", "unicode åäö – 統一", False, None, None),
    ("http://x/a", "http://x/t", "Titel", False, "sv", None),
    ("http://x/a", "http://x/t", "Title", False, "en-US", None),
    (
        "http://x/a",
        "http://x/d",
        "2004-01",
        False,
        None,
        "http://www.w3.org/2001/XMLSchema#gYearMonth",
    ),
    ("http://x/a#frag", "http://x/p", "", False, None, None),  # empty literal
]

COLS = ["subj", "pred", "obj", "obj_is_uri", "lang", "datatype"]


@pytest.fixture(scope="module")
def nasty_df(spark):
    return spark.createDataFrame(NASTY, COLS)


def test_escape_shapes(nasty_df):
    lines = {r["line"] for r in to_ntriples(nasty_df).collect()}
    assert '<http://x/a> <http://x/p> "plain" .' in lines
    assert "<http://x/a> <http://x/p> <http://x/b> ." in lines
    assert '<http://x/a> <http://x/p> "quote \\" inside" .' in lines
    assert '<http://x/a> <http://x/p> "back\\\\slash" .' in lines
    assert '<http://x/a> <http://x/p> "line\\nbreak\\r\\ttab" .' in lines
    assert '<http://x/a> <http://x/t> "Titel"@sv .' in lines
    assert '<http://x/a> <http://x/t> "Title"@en-US .' in lines
    assert (
        '<http://x/a> <http://x/d> "2004-01"'
        "^^<http://www.w3.org/2001/XMLSchema#gYearMonth> ." in lines
    )
    assert '<http://x/a#frag> <http://x/p> "" .' in lines
    # no raw newline/tab/quote survives inside any literal body
    for ln in lines:
        assert "\n" not in ln and "\r" not in ln and "\t" not in ln


def test_roundtrip_multiset(spark, nasty_df):
    back = parse_ntriples(to_ntriples(nasty_df), "line")
    want = sorted(NASTY)
    got = sorted(tuple(r) for r in back.select(*COLS).collect())
    assert got == want


def test_roundtrip_through_files(spark, nasty_df, tmp_path):
    path = str(tmp_path / "dump.nt")
    write_ntriples(nasty_df, path, partitions=3)
    got = sorted(tuple(r) for r in read_ntriples(spark, path).collect())
    assert got == sorted(NASTY)


def test_parse_lenient(spark):
    """Comment/blank/malformed lines drop; CRLF and padding are
    tolerated (lenient bulk loader)."""
    lines = spark.createDataFrame(
        [
            ("# comment",),
            ("",),
            ("   ",),
            ("not a triple at all",),
            ('<http://x/a> <http://x/p> "ok" .\r',),
            ('  <http://x/b> <http://x/p> <http://x/c> .  ',),
        ],
        ["value"],
    )
    got = parse_ntriples(lines).collect()
    assert len(got) == 2
    by_subj = {r["subj"]: r for r in got}
    assert by_subj["http://x/a"]["obj"] == "ok"
    assert by_subj["http://x/b"]["obj_is_uri"] is True


def test_distinct_set_semantics(spark):
    dup = spark.createDataFrame(
        [("http://x/a", "http://x/p", "v", False, None, None)] * 3,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    assert to_ntriples(dup).count() == 1
    assert to_ntriples(dup, distinct=False).count() == 3


def test_kg_dump_matches_duckdb_oracle(spark):
    """The catalog twin: live-KG N-Triples dump vs the committed
    fixture rebuilt line-by-line in DuckDB SQL (set equality)."""
    import duckdb

    from ferenda_spark.queries import _oracle_kg_ntriples, q_kg_ntriples

    got = {r["line"] for r in q_kg_ntriples(spark, None).collect()}
    want = {r[0] for r in duckdb.sql(_oracle_kg_ntriples()).fetchall()}
    assert got == want
    assert len(got) > 10_000


def test_serializer_plan_is_jvm_only(spark, nasty_df):
    """No Python worker in the serialize or parse plan — pure
    codegen'd projections (the 10^12-triple contract)."""
    for plan in (
        to_ntriples(nasty_df)._jdf.queryExecution().executedPlan().toString(),
        parse_ntriples(to_ntriples(nasty_df), "line")
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    ):
        assert "Python" not in plan and "mapInPandas" not in plan


def test_control_chars_and_sentinel_killers(spark):
    """Payloads that break naive sentinel-based unescaping: raw NUL,
    other C0 controls, literal backslash-u-digits text, and piles of
    adjacent backslashes."""
    cases = [
        "nul \x00 inside",
        "\x00",
        "bell \x07 vt \x0b esc \x1b",
        "backspace \b formfeed \f",
        "literal \\u0000 six chars",
        "\\\\u0000",
        "\\" * 7,
        "\\" * 8,
        "a\\",
        "\\a",
        "\x00\\\x00",
        'mix \\ " \n \t \x00 \x01 end',
    ]
    rows = [(i, "http://x/p", t, False, None, None) for i, t in enumerate(cases)]
    df = spark.createDataFrame(
        [(str(a), b, c, d, e, f) for a, b, c, d, e, f in rows],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    back = parse_ntriples(to_ntriples(df, distinct=False), "line")
    got = sorted(r["obj"] for r in back.collect())
    assert got == sorted(cases)
    # serialized lines contain no raw control characters at all
    for r in to_ntriples(df, distinct=False).collect():
        assert not any(ord(ch) < 0x20 for ch in r["line"])


def test_fuzz_roundtrip_batched(spark):
    """500 adversarial random strings (control-heavy alphabet) in
    ONE Spark round-trip; serialize -> parse must be the identity."""
    import numpy as np

    rng = np.random.RandomState(42)
    alphabet = list('\\"\n\r\t\b\f\x00\x01\x1f') + list("au0é統 .<>@^") + ["\\u0000"]
    cases = [
        "".join(rng.choice(alphabet, size=rng.randint(0, 24)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(str(i), "http://x/p", t, False, None, None)
         for i, t in enumerate(cases)],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string",
    )
    back = parse_ntriples(to_ntriples(df, distinct=False), "line")
    got = {r["subj"]: r["obj"] for r in back.collect()}
    want = {str(i): t for i, t in enumerate(cases)}
    assert got == want


def test_parse_bnodes_and_malformed_objects(spark):
    """Blank-node terms skolemize to stable urn:bnode IRIs (the
    store is bnode-free by construction); an OBJECT that is neither
    IRI, bnode nor literal is a malformed LINE and drops — it must
    never surface as a fabricated empty literal."""
    lines = spark.createDataFrame(
        [
            ("<http://x/a> <http://x/p> _:b0 .",),
            ("_:b0 <http://x/p> <http://x/c> .",),
            ("<http://x/a> <http://x/p> garbage .",),   # malformed obj
            ("<http://x/a> <http://x/p> 42 .",),        # bare number: drop
        ],
        ["value"],
    )
    got = parse_ntriples(lines).collect()
    assert len(got) == 2
    objs = {r["obj"] for r in got if r["subj"].startswith("http")}
    # same label in the same (fileless) scope -> same skolem IRI
    bn = next(iter(objs))
    assert bn.startswith("urn:bnode:") and bn.endswith(":b0")
    subj_bn = next(r for r in got if not r["subj"].startswith("http"))
    assert subj_bn["subj"] == bn and subj_bn["obj_is_uri"] is True
    # no fabricated empty-literal rows
    assert all(r["obj"] != "" for r in got)


def test_parse_escaped_single_quote(spark):
    """\\' is a legal ECHAR foreign dumps may emit; it must decode
    to a bare apostrophe, not survive as backslash-quote."""
    lines = spark.createDataFrame(
        [(r'<http://x/a> <http://x/p> "it\'s" .',)], ["value"]
    )
    got = parse_ntriples(lines).collect()
    assert got[0]["obj"] == "it's"


# ------------------------------------------------------------ N-Quads


def test_nquads_roundtrip(spark, tmp_path):
    """Quad store -> .nq file tree -> quad store: bit-exact terms,
    NULL graph for default-graph lines both directions."""
    from ferenda_spark.operators.rdfio import read_nquads, write_nquads

    rows = [
        ("u:s1", "u:p", "u:o", True, None, None, "u:g1"),
        ("u:s1", "u:p", 'lit "q" \\ tab\t', False, "en", None, "u:g2"),
        ("u:s2", "u:p", "typed", False, None, "u:dt", None),  # default graph
    ]
    quads = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string, graph string",
    )
    path = str(tmp_path / "dump.nq")
    write_nquads(quads, path)
    back = read_nquads(spark, path)
    want = {tuple(r) for r in quads.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_nquads_default_graph_line_is_ntriples(spark):
    from ferenda_spark.operators.rdfio import parse_nquads, to_nquads

    quads = spark.createDataFrame(
        [("u:s", "u:p", "u:o", True, None, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "lang string, datatype string, graph string",
    )
    [line] = [r["line"] for r in to_nquads(quads).collect()]
    assert line == "<u:s> <u:p> <u:o> ."
    # and a labeled line parses its graph back out
    lines = spark.createDataFrame(
        [("<a> <p> \"x\"@sv <g> .",), ("<a> <p> <b> .",),
         ("<a> <p> <b> garbage .",)],  # malformed tail: drop
        ["value"],
    )
    got = {(r["subj"], r["obj"], r["graph"]) for r in parse_nquads(lines).collect()}
    assert got == {("a", "x", "g"), ("a", "b", None)}


def test_to_nquads_requires_graph_column(spark):
    from ferenda_spark.operators.rdfio import to_nquads

    t = spark.createDataFrame(
        [("s", "p", "o", True)],
        "subj string, pred string, obj string, obj_is_uri boolean",
    )
    with pytest.raises(ValueError, match="graph"):
        to_nquads(t)
