"""SPARQL text front-end: run the reference's .rq files directly.

ferenda ships its graph queries as SPARQL template files
(/root/reference/ferenda/res/sparql/annotations.rq, interpolated
with %(uri)s and executed through rdflib/a remote store — triple
store select/construct surface, devel.py:1098,1119).  This module
parses the subset those templates use and compiles it onto
graphquery's distributed BGP engine, so the VERBATIM reference
query text runs against the Spark triples table:

  PREFIX declarations · SELECT ?v ... / CONSTRUCT { template }
  · basic graph patterns ('a' = rdf:type) · OPTIONAL { ... }
  · { ... } UNION { ... } chains · FILTER (simple comparisons)
  · property paths pred+ / pred* (bounded; see graphquery)

Parsing happens once on the driver (microseconds, plain strings);
everything data-sized stays in the compiled DataFrame plan.  Not a
full SPARQL 1.1 implementation — it raises loudly on syntax it does
not cover rather than guessing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ferenda_spark.operators.graphquery import (
    _join,
    _order_patterns,
    _pattern_df,
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RE = re.compile(
    r"""
      <[^>]*>                                   # IRI
    | "(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^\S+)?   # literal (+tag)
    | \?[A-Za-z_]\w*                            # variable
    | [A-Za-z_][\w-]*:[\w.-]*[*+]?              # prefixed name (+path mod)
    | [A-Za-z]+                                 # bare keyword / 'a'
    | [{}().;]                                  # punctuation
    | [*+]                                      # standalone path modifier
    | [!<>=&|]+                                 # filter operators
    """,
    re.VERBOSE,
)


class SparqlSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    # full-line comments only (a '#' inside an IRI must survive)
    lines = [ln for ln in text.splitlines() if not ln.lstrip().startswith("#")]
    return _TOKEN_RE.findall("\n".join(lines))


def _resolve(term: str, prefixes: dict[str, str]) -> str:
    """One token -> engine term (``?var`` kept, IRIs/literals
    resolved to plain strings — graphquery matches on the string)."""
    if term.startswith("?"):
        return term
    if term.startswith("<"):
        return term[1:-1]
    if term.startswith('"'):
        m = re.match(r'"((?:[^"\\]|\\.)*)"', term)
        return m.group(1).replace('\\"', '"').replace("\\\\", "\\")
    if term == "a":
        return _RDF_TYPE
    if ":" in term:
        mod = ""
        if term.endswith(("*", "+")):
            term, mod = term[:-1], term[-1]
        pfx, local = term.split(":", 1)
        if pfx not in prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r}")
        return prefixes[pfx] + local + mod
    raise SparqlSyntaxError(f"cannot parse term {term!r}")


def _parse_group(toks: list[str], i: int, prefixes: dict) -> tuple[dict, int]:
    """Parse tokens of one { } group starting AFTER its '{'.
    Returns ({patterns, optionals, filters, unions}, next_index)."""
    g = {"patterns": [], "optionals": [], "filters": [], "unions": []}
    while i < len(toks):
        t = toks[i]
        if t == "}":
            return g, i + 1
        if t == ".":
            i += 1
            continue
        if t == "{":  # subgroup: must be a UNION chain
            alts = []
            sub, i = _parse_group(toks, i + 1, prefixes)
            alts.append(sub)
            while i < len(toks) and toks[i].upper() == "UNION":
                if toks[i + 1] != "{":
                    raise SparqlSyntaxError("UNION must be followed by '{'")
                sub, i = _parse_group(toks, i + 2, prefixes)
                alts.append(sub)
            if len(alts) < 2:
                # a bare nested group is just inlined
                g["patterns"] += alts[0]["patterns"]
                g["optionals"] += alts[0]["optionals"]
                g["filters"] += alts[0]["filters"]
                g["unions"] += alts[0]["unions"]
            else:
                g["unions"].append(alts)
            continue
        if t.upper() == "OPTIONAL":
            if toks[i + 1] != "{":
                raise SparqlSyntaxError("OPTIONAL must be followed by '{'")
            sub, i = _parse_group(toks, i + 2, prefixes)
            if sub["optionals"] or sub["unions"] or sub["filters"]:
                raise SparqlSyntaxError("nested OPTIONAL bodies unsupported")
            g["optionals"].append(sub["patterns"])
            continue
        if t.upper() == "FILTER":
            if toks[i + 1] != "(":
                raise SparqlSyntaxError("FILTER must be followed by '('")
            j = toks.index(")", i + 2)
            if "(" in toks[i + 2 : j]:
                raise SparqlSyntaxError("nested FILTER parens unsupported")
            g["filters"].append(_filter_sql(toks[i + 2 : j], prefixes))
            i = j + 1
            continue
        # triple pattern: s p o (. | ; p o ...)
        s = _resolve(t, prefixes)
        i += 1
        while True:
            p = _resolve(toks[i], prefixes)
            i += 1
            if i < len(toks) and toks[i] in ("*", "+"):
                p += toks[i]
                i += 1
            o = _resolve(toks[i], prefixes)
            g["patterns"].append((s, p, o))
            i += 1
            if i < len(toks) and toks[i] == ";":
                i += 1
                continue
            break
    raise SparqlSyntaxError("unterminated group (missing '}')")


_FILTER_OPS = {"&&": "AND", "||": "OR", "!": "NOT", "=": "="}


def _filter_sql(toks: list[str], prefixes: dict) -> str:
    """FILTER tokens -> Spark SQL boolean expression over variable
    columns.  Simple comparisons/boolean combinations only."""
    out = []
    for t in toks:
        if t.startswith("?"):
            out.append(t[1:])
        elif t in _FILTER_OPS:
            out.append(_FILTER_OPS[t])
        elif re.fullmatch(r"[<>]=?|!=", t):
            out.append(t)
        elif t.startswith('"'):
            out.append("'" + _resolve(t, prefixes).replace("'", "''") + "'")
        elif t.startswith("<"):
            out.append("'" + t[1:-1] + "'")
        elif re.fullmatch(r"\d+(\.\d+)?", t):
            out.append(t)
        else:
            raise SparqlSyntaxError(f"unsupported FILTER token {t!r}")
    return " ".join(out)


def parse_sparql(text: str, params: dict | None = None) -> dict:
    """Parse the supported SPARQL subset (optionally %-interpolating
    `params` first, the reference's template convention) into
    {form, select_vars, template, where}."""
    if params:
        text = text % params
    toks = _tokenize(text)
    prefixes, i = {}, 0
    while i < len(toks) and toks[i].upper() == "PREFIX":
        pfx = toks[i + 1]
        if not pfx.endswith(":") and ":" in pfx:
            pfx = pfx.split(":", 1)[0] + ":"
        iri = toks[i + 2]
        # tokenizer may merge 'pfx:' into one prefixed-name token
        if not iri.startswith("<"):
            raise SparqlSyntaxError("PREFIX needs '<iri>'")
        prefixes[pfx.rstrip(":")] = iri[1:-1]
        i += 3
    form = toks[i].upper()
    i += 1
    out: dict = {"form": form, "select_vars": [], "template": []}
    if form == "SELECT":
        while toks[i].startswith("?") or toks[i] == "*":
            if toks[i] != "*":
                out["select_vars"].append(toks[i][1:])
            i += 1
    elif form == "CONSTRUCT":
        if toks[i] != "{":
            raise SparqlSyntaxError("CONSTRUCT needs '{ template }'")
        tmpl, i = _parse_group(toks, i + 1, prefixes)
        if tmpl["optionals"] or tmpl["unions"] or tmpl["filters"]:
            raise SparqlSyntaxError("CONSTRUCT template must be plain triples")
        out["template"] = tmpl["patterns"]
    else:
        raise SparqlSyntaxError(f"unsupported query form {form!r}")
    if toks[i].upper() != "WHERE" or toks[i + 1] != "{":
        raise SparqlSyntaxError("expected WHERE { ... }")
    out["where"], i = _parse_group(toks, i + 2, prefixes)
    return out


def _compile_group(triples: DataFrame, g: dict, max_path_hops: int) -> DataFrame:
    """Group graph pattern -> solutions DataFrame (with term-metadata
    companion columns, for CONSTRUCT)."""
    df = None
    if g["patterns"]:
        ordered = _order_patterns(g["patterns"])
        df = _pattern_df(triples, ordered[0], max_path_hops)
        for pat in ordered[1:]:
            df = _join(df, _pattern_df(triples, pat, max_path_hops))
    for alts in g["unions"]:
        parts = [_compile_group(triples, a, max_path_hops) for a in alts]
        u = parts[0]
        for p_ in parts[1:]:
            u = u.unionByName(p_, allowMissingColumns=True)
        df = u if df is None else _join(df, u)
    for opt in g["optionals"]:
        ordered = _order_patterns(opt)
        gdf = _pattern_df(triples, ordered[0], max_path_hops)
        for pat in ordered[1:]:
            gdf = _join(gdf, _pattern_df(triples, pat, max_path_hops))
        df = gdf if df is None else _join(df, gdf, "left")
    if df is None:
        raise SparqlSyntaxError("empty WHERE group")
    from pyspark.sql import functions as F

    for f in g["filters"]:
        df = df.filter(F.expr(f))
    return df


def run_sparql(
    triples: DataFrame,
    text: str,
    params: dict | None = None,
    max_path_hops: int = 3,
) -> DataFrame:
    """Execute a SPARQL text (the supported subset) against the
    triples table.  SELECT returns one column per projected variable
    (set semantics); CONSTRUCT returns the engine triples schema,
    ready for rdfio.to_ntriples or a triplestore sink."""
    q = parse_sparql(text, params)
    sols = _compile_group(triples, q["where"], max_path_hops)
    from pyspark.sql import functions as F

    if q["form"] == "SELECT":
        vars_ = q["select_vars"] or sorted(
            c for c in sols.columns
            if not c.startswith(("_isuri_", "_lang_", "_dt_")) and c != "_ground"
        )
        return sols.select(*vars_).distinct()

    # CONSTRUCT: one output triple per template entry per solution,
    # variable objects re-emitted with their matched term metadata
    parts = []
    for s, p, o in q["template"]:
        def term(t):
            return F.col(t[1:]) if t.startswith("?") else F.lit(t)

        if o.startswith("?"):
            v = o[1:]
            isuri = (
                F.coalesce(F.col(f"_isuri_{v}"), F.lit(False))
                if f"_isuri_{v}" in sols.columns
                else F.lit(False)
            )
            lang = (
                F.col(f"_lang_{v}")
                if f"_lang_{v}" in sols.columns
                else F.lit(None).cast("string")
            )
            dt = (
                F.col(f"_dt_{v}")
                if f"_dt_{v}" in sols.columns
                else F.lit(None).cast("string")
            )
        else:
            # ground template object: a full implementation would
            # sniff IRI-vs-literal from the token; template objects
            # in the reference's files are IRIs or variables
            isuri = F.lit(True)
            lang = F.lit(None).cast("string")
            dt = F.lit(None).cast("string")
        parts.append(
            sols.select(
                term(s).alias("subj"),
                term(p).alias("pred"),
                term(o).alias("obj"),
                isuri.alias("obj_is_uri"),
                lang.alias("lang"),
                dt.alias("datatype"),
            # SPARQL: a template triple with any unbound variable is
            # not generated for that solution (OPTIONAL/UNION nulls)
            ).filter(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj").isNotNull()
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.distinct()
