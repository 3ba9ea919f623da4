"""Distributed RDF bulk I/O: N-Triples serialize + parse.

Reference parity: `devel.py dumpstore nt > alltriples.nt`
(/root/reference/ferenda/devel.py:787-805) dumps the whole
triplestore as N-Triples, and the triplestore bulk-load path
(/root/reference/ferenda/triplestore.py add_serialized_file) ingests
the same format (S6).  The reference serializes through rdflib on
one node; here both directions are pure Catalyst column expressions
over the (subj, pred, obj, obj_is_uri, lang, datatype) triples
table — line-per-triple, embarrassingly parallel, no Python worker,
so a 10^12-triple dump is a single whole-stage-codegen'd projection
feeding `write.text` (and partition count = output file count is
controlled by the caller's repartition, not by this module).

Escaping follows the N-Triples 1.1 grammar for the characters our
literal values can contain: `\\`, `"`, newline, carriage return and
tab are escaped on write and unescaped on read; UTF-8 passes through
raw (N-Triples 1.1 is UTF-8).  Subject/predicate/datatype IRIs are
minted by this pipeline and never contain `>` or whitespace, so they
are emitted verbatim (documented contract, asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ECHAR escapes (N-Triples 1.1 grammar), backslash FIRST on the
#: write side so later rewrites can't double-escape.
_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
    ("\b", "\\b"),
    ("\f", "\\f"),
]
#: remaining C0 controls (legal raw per the grammar, but raw
#: controls round-trip poorly through text tooling — canonicalize
#: them to UCHAR \u00XX on write)
_OTHER_C0 = [chr(c) for c in range(0x20) if chr(c) not in "\t\n\r\b\f"]
#: pure-Catalyst gate for the rare-control slow path
_C0_MARK = "[\\x00-\\x08\\x0B\\x0E-\\x1F]"


def escape_literal(col: Column) -> Column:
    """N-Triples string-literal escape as chained JVM `replace`
    calls: the seven ECHARs always; the 27 other C0 controls to
    \\u00XX behind an rlike gate, so clean text (everything a normal
    corpus emits) pays only the ECHAR chain."""
    basic = col
    for raw, esc in _ESCAPES:
        basic = F.replace(basic, F.lit(raw), F.lit(esc))
    full = basic
    for c in _OTHER_C0:
        full = F.replace(full, F.lit(c), F.lit("\\u%04x" % ord(c)))
    return F.when(col.rlike(_C0_MARK), full).otherwise(basic)


def _unescape_segment(seg: Column) -> Column:
    """Unescape one split segment — segments contain only SINGLE
    backslashes (doubles were the split delimiter), so every
    backslash starts a genuine escape sequence."""
    for raw, esc in _ESCAPES[1:]:
        seg = F.replace(seg, F.lit(esc), F.lit(raw))
    # \' is a legal ECHAR we never EMIT (raw ' needs no escape) but
    # must ACCEPT — foreign dumps that uniformly escape quotes are
    # conformant N-Triples 1.1
    seg = F.replace(seg, F.lit("\\'"), F.lit("'"))
    for c in range(0x20):
        seg = F.replace(seg, F.lit("\\u%04x" % c), F.lit(chr(c)))
        seg = F.replace(seg, F.lit("\\u%04X" % c), F.lit(chr(c)))
    return seg


def unescape_literal(col: Column) -> Column:
    """Inverse of escape_literal, correct for EVERY payload
    (including literals that contain raw NULs or the six characters
    `\\u0000` as plain text): split on literal `\\\\` pairs — inside
    the resulting segments every remaining backslash begins a real
    escape — unescape each segment, and rejoin with a single
    backslash.  UCHARs outside the C0 range pass through untouched
    (lenient; this engine never emits them).  Gated on containing a
    backslash at all, so clean literals skip the whole machinery."""
    slow = F.array_join(
        F.transform(F.split(col, "\\\\\\\\", -1), _unescape_segment),
        "\\",
    )
    return F.when(col.contains("\\"), slow).otherwise(col)


def ntriples_line(
    subj: Column,
    pred: Column,
    obj: Column,
    obj_is_uri: Column,
    lang: Column,
    datatype: Column,
    graph: Column | None = None,
) -> Column:
    """One N-Triples line per triple.  Literal objects get a
    language tag OR a datatype IRI (RDF terms carry at most one;
    lang wins if both are somehow set, matching rdflib).  With a
    `graph` column the line becomes N-Quads: the graph IRI is the
    fourth term when set, and a NULL/empty graph (default-graph
    statement) keeps the plain triple line (spec §2)."""
    tag = (
        F.when(lang.isNotNull() & (lang != ""), F.concat(F.lit("@"), lang))
        .when(
            datatype.isNotNull() & (datatype != ""),
            F.concat(F.lit("^^<"), datatype, F.lit(">")),
        )
        .otherwise(F.lit(""))
    )
    obj_term = F.when(obj_is_uri, F.concat(F.lit("<"), obj, F.lit(">"))).otherwise(
        F.concat(F.lit('"'), escape_literal(obj), F.lit('"'), tag)
    )
    gterm = (
        F.when(
            graph.isNotNull() & (graph != ""),
            F.concat(F.lit(" <"), graph, F.lit(">")),
        ).otherwise(F.lit(""))
        if graph is not None
        else F.lit("")
    )
    return F.concat(
        F.lit("<"), subj, F.lit("> <"), pred, F.lit("> "), obj_term,
        gterm, F.lit(" ."),
    )


def to_ntriples(triples: DataFrame, distinct: bool = True) -> DataFrame:
    """triples table -> single-column DataFrame of N-Triples lines.

    `distinct=True` applies graph set-semantics (a triplestore dump
    has no duplicate statements — reference `dumpstore` dumps a
    set-backed store); the dedup is one hash-aggregate shuffle on
    the line itself, map-side combined.  Pass False for a raw
    statement stream (e.g. when the input is already distinct)."""
    lang = triples["lang"] if "lang" in triples.columns else F.lit(None)
    dt = triples["datatype"] if "datatype" in triples.columns else F.lit(None)
    out = triples.select(
        ntriples_line(
            triples["subj"], triples["pred"], triples["obj"],
            triples["obj_is_uri"], lang, dt,
        ).alias("line")
    )
    return out.distinct() if distinct else out


def to_nquads(quads: DataFrame, distinct: bool = True) -> DataFrame:
    """Multi-graph store -> N-Quads lines: the triple line plus the
    graph IRI as the fourth term; rows with a NULL/empty graph are
    DEFAULT-graph statements and serialize without a graph label
    (N-Quads spec §2 — a default-graph quad line IS an N-Triples
    line).  Same pure-Catalyst projection + optional set-semantics
    dedup as to_ntriples; pairs with the `graph` column the quad
    query path (sparql GRAPH ?var / kg_graphs) reads."""
    if "graph" not in quads.columns:
        raise ValueError("to_nquads needs a `graph` column (see to_ntriples)")
    lang = quads["lang"] if "lang" in quads.columns else F.lit(None)
    dt = quads["datatype"] if "datatype" in quads.columns else F.lit(None)
    out = quads.select(
        ntriples_line(
            quads["subj"], quads["pred"], quads["obj"],
            quads["obj_is_uri"], lang, dt, graph=quads["graph"],
        ).alias("line")
    )
    return out.distinct() if distinct else out


def parse_nquads(
    lines: DataFrame, col: str = "value", scope: str | None = None
) -> DataFrame:
    """N-Quads lines -> the quad schema (triples columns + `graph`,
    NULL for default-graph lines — a quad line without a graph label
    IS an N-Triples line, spec §2).  Same lenient drop-malformed
    contract, skolemization and scope rules as parse_ntriples; the
    graph label must be an IRI (blank-node graph labels are out of
    scope, as in the engine's stores).  Still one scan + projection,
    no shuffle."""
    return _parse_lines(lines, col, scope, _QLINE_RE, with_graph=True)


def write_ntriples(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Dump a triples table as an N-Triples file tree (one .nt shard
    per partition).  The reference's single-process `dumpstore nt`
    analog, distributed: serialization is a codegen'd projection, so
    throughput is bounded by the text sink, not the formatter."""
    lines = to_ntriples(triples)
    if partitions:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)


# ------------------------------------------------------------------ parse

#: blank-node label (pragmatic subset of the 1.1 charset)
_BNODE = r"_:[A-Za-z0-9][A-Za-z0-9_.-]*"
#: a VALID object term: IRI, blank node, or literal with optional
#: @lang / ^^<dt> tag.  The line match validates the term shape —
#: an object that is none of these (malformed term, stray text) is
#: a malformed LINE and drops, never a fabricated empty literal.
_OBJ_TERM = (
    r"<[^>]*>"
    rf"|{_BNODE}"
    r'|"(?:[^"\\]|\\.)*"'
    r"(?:@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*|\^\^<[^>]*>)?"
)
#: whole-line shape: subject IRI or bnode, predicate IRI, object
#: term, dot.  Tolerates leading/trailing whitespace and \r (dumps
#: from CRLF systems); comment and blank lines are filtered first.
_LINE_RE = rf"^\s*(<[^>]*>|{_BNODE})\s+<([^>]*)>\s+({_OBJ_TERM})\s*\.\s*$"
#: N-Quads line: same shape plus an OPTIONAL graph IRI as term 4
_QLINE_RE = (
    rf"^\s*(<[^>]*>|{_BNODE})\s+<([^>]*)>\s+({_OBJ_TERM})"
    r"(?:\s+<([^>]*)>)?\s*\.\s*$"
)
#: object-term shapes
_OBJ_URI_RE = r"^<(.*)>$"
_OBJ_LIT_RE = r'^"((?:[^"\\]|\\.)*)"'
_OBJ_LANG_RE = r'"@([A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)$'
_OBJ_DT_RE = r'"\^\^<([^>]*)>$'


def _skolemize(term: Column, scope: Column) -> Column:
    """Blank-node term -> stable skolem IRI (the engine's stores are
    bnode-free by construction; foreign bnodes become
    ``urn:bnode:<scope>:<label>``).  Scope is per input file — bnode
    labels are document-scoped in the grammar, and file-hash scoping
    keeps labels from distinct dump shards from aliasing while
    staying a pure column expression (no shuffle, no state)."""
    return F.concat(
        F.lit("urn:bnode:"), scope, F.lit(":"), F.substring(term, 3, 2**30)
    )


def parse_ntriples(
    lines: DataFrame, col: str = "value", scope: str | None = None
) -> DataFrame:
    """N-Triples lines -> (subj, pred, obj, obj_is_uri, lang,
    datatype) — the bulk-load direction (reference
    triplestore.py add_serialized_file).  Pure regexp_extract +
    replace column work: a 100 TB .nt ingest is scan + projection,
    no shuffle.  Comment (#...) and blank lines are dropped;
    malformed lines — including malformed OBJECT terms, which must
    never become fabricated empty literals — are dropped too (the
    full-line match validates every term shape), mirroring a lenient
    bulk loader.  Blank-node subjects/objects are skolemized to
    ``urn:bnode:<scope>:<label>`` IRIs (see _skolemize).

    Skolem scope: for file sources, md5(input_file_name()) — bnode
    labels are file-scoped in the grammar.  For NON-file sources
    (in-memory DataFrames, some streaming sources)
    input_file_name() is '' for every row, which would alias labels
    from distinct logical documents; there the caller must pass
    ``scope`` (either the name of an existing column carrying a
    per-document scope, or any constant string identifying this
    load).  Without it the empty-file-name fallback scope is the
    constant ``mem``: the no-aliasing guarantee weakens to per-LOAD
    (labels from distinct documents in ONE memory-sourced load can
    still alias) — pass ``scope`` when that matters."""
    return _parse_lines(lines, col, scope, _LINE_RE, with_graph=False)


def _parse_lines(
    lines: DataFrame,
    col: str,
    scope: str | None,
    line_re: str,
    with_graph: bool,
) -> DataFrame:
    """Shared N-Triples / N-Quads line parser (see parse_ntriples
    for the contract; parse_nquads adds the optional graph term as
    match group 4)."""
    if scope is not None:
        scope_col = (
            F.col(scope).cast("string")
            if scope in lines.columns
            else F.lit(scope)
        )
    else:
        # input_file_name() is '' for non-file sources; fall back to
        # a per-load marker so distinct loads never alias even then
        fn = F.input_file_name()
        scope_col = F.when(
            fn != "", F.substring(F.md5(fn), 1, 8)
        ).otherwise(F.lit("mem"))
    src = lines.select(
        F.col(col).alias("_l"),
        scope_col.alias("_scope"),
    )
    src = src.filter(
        (F.trim("_l") != "") & ~F.trim("_l").startswith("#")
        & F.col("_l").rlike(line_re)
    )
    subj_term = F.regexp_extract("_l", line_re, 1)
    obj_term = F.regexp_extract("_l", line_re, 3)
    is_uri = obj_term.startswith("<")
    is_bnode = obj_term.startswith("_:")
    lang = F.regexp_extract(obj_term, _OBJ_LANG_RE, 1)
    dt = F.regexp_extract(obj_term, _OBJ_DT_RE, 1)
    cols = [
        F.when(
            subj_term.startswith("_:"),
            _skolemize(subj_term, F.col("_scope")),
        )
        .otherwise(F.regexp_extract(subj_term, _OBJ_URI_RE, 1))
        .alias("subj"),
        F.regexp_extract("_l", line_re, 2).alias("pred"),
        F.when(is_uri, F.regexp_extract(obj_term, _OBJ_URI_RE, 1))
        .when(is_bnode, _skolemize(obj_term, F.col("_scope")))
        .otherwise(unescape_literal(F.regexp_extract(obj_term, _OBJ_LIT_RE, 1)))
        .alias("obj"),
        (is_uri | is_bnode).alias("obj_is_uri"),
        F.when(lang != "", lang).alias("lang"),
        F.when(dt != "", dt).alias("datatype"),
    ]
    if with_graph:
        g = F.regexp_extract("_l", line_re, 4)
        cols.append(F.when(g != "", g).alias("graph"))
    return src.select(*cols)


def read_ntriples(spark, path: str) -> DataFrame:
    """spark.read.text + parse: the distributed bulk-load entry."""
    return parse_ntriples(spark.read.text(path), "value")


def read_nquads(spark, path: str) -> DataFrame:
    """The multi-graph bulk-load entry (quad schema out)."""
    return parse_nquads(spark.read.text(path), "value")


def write_nquads(quads: DataFrame, path: str, partitions: int | None = None) -> None:
    """Dump a multi-graph store as an N-Quads file tree (see
    write_ntriples — same codegen'd projection, text sink bound)."""
    lines = to_nquads(quads)
    if partitions:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)
