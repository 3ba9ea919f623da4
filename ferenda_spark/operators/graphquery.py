"""SPARQL basic-graph-pattern queries compiled to DataFrame joins.

Reference parity: ferenda runs arbitrary SPARQL SELECT/CONSTRUCT
against its triplestore — `devel.py:1119` (construct command),
`devel.py:1098` (select), and the per-document annotation CONSTRUCT
in documentrepository.py — via rdflib/remote stores on one node.
This module restates the workhorse subset (basic graph patterns +
OPTIONAL groups + FILTER expressions + CONSTRUCT templates) as a
compiler onto the distributed triples table:

- each triple pattern becomes a filtered scan of `triples` with its
  constant terms pushed down (predicate constants reach the parquet
  scan as PushedFilters; a store partitioned by `pred` prunes
  partitions outright),
- shared variables become equi-join keys (Catalyst/AQE pick
  broadcast for selective patterns, shuffle-hash otherwise),
- patterns are greedily ordered most-constants-first and
  connected-variable-next, so the plan starts from the most
  selective scan and never forms an accidental cartesian unless the
  query itself is disconnected (in which case crossJoin is explicit
  and documented),
- OPTIONAL groups compile recursively and left-join on their shared
  variables (SPARQL left-outer semantics),
- FILTER strings are Spark SQL expressions over the variable
  columns (variable `?x` is column `x`).

At 10^12 triples this is exactly the plan a relational SPARQL
engine (e.g. the published Sempala/S2RDF designs) produces for BGPs:
selective-scan + join-reorder, no Python anywhere.
"""

from __future__ import annotations

import contextvars
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hidden companion-column prefixes carrying the RDF term metadata
#: of variables bound in OBJECT position, so CONSTRUCT can re-emit
#: the term (uri vs literal, lang tag, datatype) losslessly.
_META = ("_isuri_", "_lang_", "_dt_")


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vname(term: str) -> str:
    return term[1:]


def closure_pairs(
    step: DataFrame, min_hops: int = 1, max_hops: int = 3
) -> DataFrame:
    """Bounded transitive closure of an arbitrary (src, dst) edge
    relation: pairs connected by chains of min..max composed steps.
    The unbounded closure is a non-starter at 10^12 triples; the
    reference itself bounds its isPartOf* annotation walk to 3
    (documentrepository.py via relate.annotations).  max_hops-1
    self-joins on the frontier; each hop's frontier is the only
    thing shuffled, and containment-style edges fan out sublinearly
    so the frontier shrinks as it climbs.

    Each hop's frontier is DEDUPED before the next join (semi-naive
    style): without it the frontier carries one row per *path*, and
    path counts grow multiplicatively with graph density — a dense
    web-citation graph has exponentially more length-i paths than
    distinct (src, dst) pairs, while the deduped frontier is bounded
    by the pair count.  Costs one exchange per hop; the dedup key is
    the same (src) the next join shuffles on, so AQE reuses the
    partitioning where it can."""
    out = step if min_hops <= 1 else None
    hop = step
    for i in range(2, max_hops + 1):
        hop = (
            hop.alias("a")
            .join(step.alias("b"), F.col("a.dst") == F.col("b.src"), "inner")
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
        if i >= min_hops:
            out = hop if out is None else out.union(hop)
    return out.distinct()


def property_path(
    triples: DataFrame, pred: str, min_hops: int = 1, max_hops: int = 3
) -> DataFrame:
    """(src, dst) pairs connected by `pred` chains of min..max hops —
    the bounded reading of SPARQL's `pred+`.  One selective scan of
    the predicate (pushed down to the store), then closure_pairs."""
    step = triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return closure_pairs(step, min_hops, max_hops)


#: path-quantifier suffix on a predicate string: pred{m,n} / pred{n}
#: (the reference's prop-annotations.rq uses isPartOf{,1})
_QUANT_RE = re.compile(r"\{(\d*)(,)?(\d*)\}$")


def _path_bounds(p: str, max_path_hops: int):
    """Split a path-predicate string into (base_pred, min_hops,
    max_hops), or return None if `p` carries no path modifier.
    '*' = 0..max, '+' = 1..max, '{m,n}' = m..n (empty m -> 0, empty
    n -> max_path_hops), '{n}' = exactly n."""
    if p.endswith("*"):
        return p[:-1], 0, max_path_hops
    if p.endswith("+"):
        return p[:-1], 1, max_path_hops
    m = _QUANT_RE.search(p)
    if not m:
        return None
    lo_s, comma, hi_s = m.groups()
    lo = int(lo_s) if lo_s else 0
    hi = int(hi_s) if hi_s else (max_path_hops if comma else lo)
    if hi < 1 or hi < lo:
        raise ValueError(f"unsupported path quantifier in {p!r}")
    return p[: m.start()], lo, hi


def _alts_pairs(triples: DataFrame, alts, max_path_hops: int) -> DataFrame:
    """Compile a composite path body — alternation branches of
    sequences of (inverted, pred) steps, the payload of a
    parenthesized SPARQL path — to one (src, dst) edge relation.
    Each step is a selective predicate scan (or its own bounded
    closure when the element carries a quantifier with a ≥1 lower
    bound); a sequence chains steps with equi-joins, an alternation
    unions branches.  Purely relational: at 10^12 triples this is
    the edge-relation materialization a Sempala-style engine feeds
    its closure operator."""
    branches = []
    for seq in alts:
        pairs = None
        for inv, p in seq:
            if _is_var(p):
                raise ValueError(
                    "variable predicates inside a quantified "
                    "parenthesized path are not supported"
                )
            if isinstance(p, tuple) and p and p[0] == "path":
                # a nested quantified element (e.g. a quantified NPS
                # inside a composed body): its own bounded closure
                # becomes this step's edge relation
                _, balts, lo, hi = p
                if lo == 0:
                    raise ValueError(
                        "zero-lower-bound element quantifier inside "
                        "a quantified parenthesized path is not "
                        "supported"
                    )
                step = closure_pairs(
                    _alts_pairs(triples, balts, max_path_hops),
                    lo,
                    max_path_hops if hi is None else hi,
                )
            elif isinstance(p, tuple) and p and p[0] == "nps":
                step = _nps_scan(triples, p[1], p[2]).select(
                    F.col("subj").alias("src"), F.col("obj").alias("dst")
                )
            elif (bounds := _path_bounds(p, max_path_hops)) is not None:
                base, lo, hi = bounds
                if lo == 0:
                    # a zero-hop element inside a composed edge body
                    # would need the store's node set as identity —
                    # rewrite (a?/b)+ style queries to spell the
                    # cases out instead of guessing
                    raise ValueError(
                        "zero-lower-bound element quantifier inside "
                        "a quantified parenthesized path is not "
                        "supported"
                    )
                step = property_path(triples, base, lo, hi)
            else:
                step = triples.filter(F.col("pred") == p).select(
                    F.col("subj").alias("src"), F.col("obj").alias("dst")
                )
            if inv:
                step = step.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            if pairs is None:
                pairs = step
            else:
                pairs = (
                    pairs.alias("a")
                    .join(
                        step.alias("b"),
                        F.col("a.dst") == F.col("b.src"),
                        "inner",
                    )
                    .select(
                        F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst"),
                    )
                )
        branches.append(pairs)
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out.distinct()


def _pred_closure(p, max_path_hops: int):
    """(inner, lo, hi) when the predicate term is closure-shaped —
    a string with a quantifier suffix (pred+ / pred* / pred{m,n})
    or the SPARQL parser's ("path", alts, lo, hi) marker for a
    quantified parenthesized path (hi None = engine bound) — else
    None.  `inner` is the base predicate string or the alts body."""
    if isinstance(p, tuple) and p and p[0] == "path":
        _, alts, lo, hi = p
        return alts, lo, (max_path_hops if hi is None else hi)
    if isinstance(p, str) and not _is_var(p):
        return _path_bounds(p, max_path_hops)
    return None


def _path_pattern_df(
    triples: DataFrame, s, base, o, min_hops: int, max_hops: int,
    max_path_hops: int = 3,
) -> DataFrame:
    """Compile a path pattern (pred+ / pred* / pred{m,n} or a
    quantified parenthesized body, bounded).

    min_hops=0 is SPARQL zero-or-more: ground endpoints filter the
    pair set — pushed into the hop joins by Catalyst — and
    contribute the zero-hop identity solution.  A var-var zero-hop
    needs the node set for the identity rows (distinct subjects ∪
    URI objects); correct but store-sized, so prefer a ground
    endpoint where the query allows (the reference's isPartOf*
    always has one)."""
    if _ACTIVE_GRAPH_VAR.get() is not None:
        # per-graph transitive closure would need graph-keyed hop
        # joins throughout property_path — an explicit non-goal for
        # now; fail at compile, never silently cross graphs
        raise ValueError(
            "property paths inside GRAPH ?var are not supported"
        )
    zero = min_hops == 0
    if isinstance(base, str):
        pairs = property_path(triples, base, max(min_hops, 1), max_hops)
    else:
        pairs = closure_pairs(
            _alts_pairs(triples, base, max_path_hops),
            max(min_hops, 1),
            max_hops,
        )
    if zero:
        spark_range = triples.sparkSession.range(1)
        if not _is_var(o):
            ident = spark_range.select(
                F.lit(o).alias("src"), F.lit(o).alias("dst")
            )
        elif not _is_var(s):
            ident = spark_range.select(
                F.lit(s).alias("src"), F.lit(s).alias("dst")
            )
        else:
            nodes = (
                triples.select(F.col("subj").alias("n"))
                .union(triples.filter("obj_is_uri").select(F.col("obj").alias("n")))
                .distinct()
            )
            ident = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        pairs = pairs.union(ident).distinct()
    cols = []
    if _is_var(s):
        cols.append(F.col("src").alias(_vname(s)))
    else:
        pairs = pairs.filter(F.col("src") == s)
    if _is_var(o):
        v = _vname(o)
        cols += [
            F.col("dst").alias(v),
            F.lit(True).alias(f"_isuri_{v}"),
            F.lit(None).cast("string").alias(f"_lang_{v}"),
            F.lit(None).cast("string").alias(f"_dt_{v}"),
        ]
    else:
        pairs = pairs.filter(F.col("dst") == o)
    if not cols:  # fully-ground path: existence gate, one row max
        return pairs.select(F.lit(True).alias("_ground")).limit(1)
    return pairs.select(*cols)


def _nps_scan(triples: DataFrame, fwd, invs) -> DataFrame:
    """Negated property set (SPARQL 1.1 §9.1) as a scan: the union
    of a forward part (triples whose predicate is NOT among the
    forward members — `Not(In(pred, ...))`, pushed to the store) and
    an endpoint-swapped reverse part over the inverse members.  An
    all-forward or all-inverse set has only its one part (the spec's
    translation: `!(a|^b)` = `!a | ^!b`).  The swapped part's object
    is an RDF subject, a URI by construction."""
    parts = []
    if fwd:
        parts.append(triples.filter(~F.col("pred").isin(list(fwd))))
    if invs:
        sw = triples.filter(~F.col("pred").isin(list(invs)))
        cols = [
            F.col("obj").alias("subj"),
            F.col("pred"),
            F.col("subj").alias("obj"),
            F.lit(True).alias("obj_is_uri"),
        ]
        if "lang" in triples.columns:
            cols += [
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("datatype"),
            ]
        if "graph" in triples.columns:
            cols.append(F.col("graph"))
        parts.append(sw.select(*cols))
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt, allowMissingColumns=True)
    return out


#: Active variable-graph binding (GRAPH ?g { ... }): set by the
#: SPARQL compiler around the subgroup compile, read by _pattern_df.
#: When set, EVERY pattern scan in the region also binds the store's
#: `graph` column to this variable — the subsequent shared-variable
#: joins then enforce the spec's same-graph constraint across the
#: group's patterns for free (quad-store semantics without touching
#: the join machinery).  Compile-time only, like _ACTIVE_STATS.
_ACTIVE_GRAPH_VAR: contextvars.ContextVar = contextvars.ContextVar(
    "ferenda_graph_var", default=None
)


class use_graph_var:
    """Scope a GRAPH ?var binding over a compile region."""

    def __init__(self, var: str | None):
        self.var = var
        self._tok = None

    def __enter__(self):
        self._tok = _ACTIVE_GRAPH_VAR.set(self.var)
        return self

    def __exit__(self, *exc):
        _ACTIVE_GRAPH_VAR.reset(self._tok)


def _pattern_df(triples: DataFrame, pattern, max_path_hops: int = 3) -> DataFrame:
    """One triple pattern -> (filtered, renamed) scan.  A predicate
    string ending in '+', '*' or '{m,n}' compiles to property_path
    (bounded transitive closure; a zero lower bound includes the
    zero-hop identity); a ("nps", fwd, invs) predicate marker to the
    negated-property-set scan (binds no predicate variable).  Under
    an active GRAPH ?var region the scan additionally binds the
    `graph` column to that variable (see _ACTIVE_GRAPH_VAR)."""
    s, p, o = pattern
    bounds = _pred_closure(p, max_path_hops)
    if bounds is not None:
        base, lo, hi = bounds
        return _path_pattern_df(triples, s, base, o, lo, hi, max_path_hops)
    if isinstance(p, tuple) and p and p[0] == "nps":
        triples = _nps_scan(triples, p[1], p[2])
        p = None
    df = triples
    cols, seen = [], {}
    for term, src in ((s, "subj"), (p, "pred"), (o, "obj")):
        if term is None:
            continue
        if not _is_var(term):
            df = df.filter(F.col(src) == term)
        elif _vname(term) in seen:
            # one variable twice in a pattern (?x <p> ?x): an
            # equality constraint, not a second column
            df = df.filter(F.col(src) == F.col(seen[_vname(term)]))
        else:
            v = _vname(term)
            seen[v] = src
            cols.append(F.col(src).alias(v))
            if src == "obj":
                cols.append(F.col("obj_is_uri").alias(f"_isuri_{v}"))
                if "lang" in triples.columns:
                    cols.append(F.col("lang").alias(f"_lang_{v}"))
                    cols.append(F.col("datatype").alias(f"_dt_{v}"))
    gvar = _ACTIVE_GRAPH_VAR.get()
    if gvar is not None and "graph" in triples.columns:
        if gvar in seen:
            # GRAPH ?g { ?g <p> ?o }: equality constraint, not a
            # second binding of the same variable
            df = df.filter(F.col("graph") == F.col(seen[gvar]))
        else:
            seen[gvar] = "graph"
            cols.append(F.col("graph").alias(gvar))
    if not cols:  # fully-ground pattern: existence gate, one row max
        return df.select(F.lit(True).alias("_ground")).limit(1)
    return df.select(*cols)


def _visible(df: DataFrame) -> set[str]:
    return {c for c in df.columns if not c.startswith(_META) and c != "_ground"}


def _join(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """Join two compiled pattern groups on their shared visible
    variables; term-metadata companions of shared object variables
    are deduplicated (same term string -> same metadata)."""
    shared = sorted(_visible(left) & _visible(right))
    drop = [
        f"{m}{v}" for v in shared for m in _META
        if f"{m}{v}" in left.columns and f"{m}{v}" in right.columns
    ]
    if "_ground" in left.columns and "_ground" in right.columns:
        drop.append("_ground")
    right = right.drop(*drop)
    if not shared:
        return left.crossJoin(right) if how == "inner" else left
    return left.join(right, shared, how)


def _copy_endpoint(df: DataFrame, src_v: str, dst_v: str) -> DataFrame:
    """Zero-hop identity solutions of a var-var path: bind the free
    endpoint to the bound one (plus term metadata — a copy if the
    source has any, else subject-position defaults)."""
    out = df.withColumn(dst_v, F.col(src_v))
    for m in _META:
        sc, dc = f"{m}{src_v}", f"{m}{dst_v}"
        if sc in df.columns:
            out = out.withColumn(dc, F.col(sc))
        elif m == "_isuri_":
            out = out.withColumn(dc, F.lit(True))
        else:
            out = out.withColumn(dc, F.lit(None).cast("string"))
    return out


def _join_pattern(triples, df, pat, max_path_hops) -> DataFrame:
    """Fold one pattern onto the solutions built so far.

    The scale-critical special case: a var-var zero-or-more path
    (?a pred* ?b) whose endpoint is already bound.  Compiled naively
    its zero-hop identity needs the distinct node set of the whole
    store; bound, the identity solutions are just ?b := ?a — a
    projection, no scan (the ≥1-hop pairs still come from the
    bounded closure).  This is how keyword_sfs.rq's
    `?uri dcterms:isPartOf* ?baseuri` stays store-scan-free at
    10^12 triples."""
    s, p, o = pat
    if df is not None and not _is_var(p):
        bounds = _pred_closure(p, max_path_hops)
        if bounds and bounds[1] == 0 and _is_var(s) and _is_var(o):
            base, _, hi = bounds
            sv, ov, vis = _vname(s), _vname(o), _visible(df)
            if sv in vis or ov in vis:
                pos = _path_pattern_df(
                    triples, s, base, o, 1, hi, max_path_hops
                )
                joined = _join(df, pos)
                if sv in vis and ov in vis:
                    ident = df.filter(F.col(sv) == F.col(ov))
                elif sv in vis:
                    ident = _copy_endpoint(df, sv, ov)
                else:
                    ident = _copy_endpoint(df, ov, sv)
                return joined.unionByName(ident, allowMissingColumns=True)
    nxt = _pattern_df(triples, pat, max_path_hops)
    return nxt if df is None else _join(df, nxt)


def _fold_patterns(
    triples, patterns, max_path_hops, df=None, stats=None
) -> DataFrame:
    """Selectivity-ordered fold of a pattern group onto `df` (or
    from scratch when df is None)."""
    for pat in _order_patterns(patterns, stats):
        df = _join_pattern(triples, df, pat, max_path_hops)
    return df


def _vv_zero_path(t) -> bool:
    """Is this a var-var path pattern with a zero lower bound?  Such
    patterns compile to a store-sized node-set identity UNLESS an
    endpoint is already bound (see _join_pattern) — so ordering must
    never let one lead a group it shares variables with."""
    s, p, o = t
    if not (_is_var(s) and _is_var(o) and not _is_var(p)):
        return False
    try:
        bounds = _pred_closure(p, 3)
    except ValueError:
        return False
    return bounds is not None and bounds[1] == 0


#: Ambient predicate stats for compile scopes that recurse through
#: many helpers (the SPARQL text compiler): set by run_sparql /
#: use_stats around compilation, read by _order_patterns when no
#: stats are passed explicitly.  Compile-time only — the returned
#: DataFrames are lazy but their join ORDER is fixed here.
_ACTIVE_STATS: contextvars.ContextVar = contextvars.ContextVar(
    "ferenda_pred_stats", default=None
)


class use_stats:
    """Context manager scoping predicate statistics over a compile
    region: ``with use_stats(stats): run_sparql(...)``. Nest-safe."""

    def __init__(self, stats: dict | None):
        self.stats = stats
        self._tok = None

    def __enter__(self):
        self._tok = _ACTIVE_STATS.set(self.stats)
        return self

    def __exit__(self, *exc):
        _ACTIVE_STATS.reset(self._tok)
        return False


def pred_stats(triples: DataFrame) -> dict[str, int]:
    """Predicate-frequency statistics for cost-based pattern
    ordering: one partial-aggregating groupBy over the store.  The
    predicate vocabulary of an RDF corpus is schema-sized (dozens to
    a few thousand — ferenda's is ~20 predicates), so the collect is
    metadata-sized at any corpus scale; compute ONCE per store and
    reuse across queries (the catalog memoizes it with the KG).
    This is the RDF-3X/Virtuoso statistics idea restated on Spark:
    the optimizer cannot know that `rdf:type` is 100× hotter than
    `dcterms:references` until a scan runs — a one-shot stats pass
    tells the compile-time join order, AQE still re-plans the
    physical side at runtime."""
    return {
        r["pred"]: r["n"]
        for r in triples.groupBy("pred").agg(F.count("*").alias("n")).collect()
    }


def _est_card(t, stats: dict) -> int:
    """Estimated scan cardinality of one pattern under predicate
    stats: the base predicate's triple count (path quantifiers
    look up their base predicate; variable predicates, NPS
    complements and composed path bodies estimate as the whole
    store).  Used only as an ordering key — never as a hard plan
    decision, so a stale estimate degrades order, not correctness.
    A constant predicate ABSENT from the stats scans 0 rows — the
    most selective pattern there is — so it estimates as 0, not as
    the whole store (stale-stats staleness only ever reorders)."""
    total = sum(stats.values()) or 1
    _, p, _ = t
    if isinstance(p, str) and not _is_var(p):
        # a malformed quantifier (e.g. '{0}', hi<1) must surface as
        # a syntax error from the EXECUTION path, not a ValueError
        # out of this ordering key — estimate as whole-store instead
        try:
            b = _path_bounds(p, 10)
        except ValueError:
            return total
        base = b[0] if b is not None else p
        return stats.get(base, 0)
    return total


def _order_patterns(patterns, stats: dict | None = None) -> list:
    """Most-constants-first, then greedily connected — the classic
    selectivity heuristic, applied at compile time (AQE re-plans the
    physical side at runtime).  Var-var zero-or-more paths sort last
    so a binding pattern runs first and the zero-hop identity stays
    algebraic (no node-set scan).  With predicate stats (see
    pred_stats) patterns of equal shape tie-break by estimated scan
    cardinality, so the fold leads with the rarest predicate and
    the greedy connected walk extends through the smallest
    intermediate results first."""
    if stats is None:
        stats = _ACTIVE_STATS.get()
    rest = sorted(
        patterns,
        key=lambda t: (
            sum(_is_var(x) for x in t) + (4 if _vv_zero_path(t) else 0),
            _est_card(t, stats) if stats else 0,
            list(map(str, t)),
        ),
    )
    if not rest:
        return []
    ordered, bound = [rest.pop(0)], set()
    bound.update(_vname(x) for x in ordered[0] if _is_var(x))
    while rest:
        nxt = next(
            (t for t in rest if any(_is_var(x) and _vname(x) in bound for x in t)),
            rest[0],
        )
        rest.remove(nxt)
        ordered.append(nxt)
        bound.update(_vname(x) for x in nxt if _is_var(x))
    return ordered


def bgp(
    triples: DataFrame,
    patterns,
    optionals=(),
    filters=(),
    select=None,
    distinct: bool = True,
    max_path_hops: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """SELECT over a basic graph pattern.

    patterns: [(s, p, o), ...] — strings; "?x" marks a variable.
    optionals: [[(s, p, o), ...], ...] — OPTIONAL groups (left join).
    filters: Spark-SQL boolean expression strings over variable
      columns (``?x`` is column ``x``), e.g. ``"issued >= '2004'"``.
    select: variable names (without "?") to project; default all.
    stats: optional pred_stats() dict for cost-based join order.
    """
    out = _fold_patterns(triples, patterns, max_path_hops, stats=stats)
    for group in optionals:
        gdf = _fold_patterns(triples, group, max_path_hops, stats=stats)
        out = _join(out, gdf, "left")
    for f in filters:
        out = out.filter(F.expr(f))
    proj = select if select is not None else sorted(_visible(out))
    out = out.select(*proj)
    return out.distinct() if distinct else out


def construct(
    triples: DataFrame,
    where,
    template,
    optionals=(),
    filters=(),
    max_path_hops: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """CONSTRUCT: match `where` (+ optionals/filters) and emit one
    triple per template entry per solution, in the engine's triples
    schema — so the output feeds rdfio.to_ntriples / a triplestore
    sink directly (the reference's annotation-graph CONSTRUCT,
    devel.py:1119).

    template: [(s, p, o, obj_is_uri), ...]; terms may be variables.
    For a variable object, pass obj_is_uri=None to reuse the matched
    term's own metadata (uri-ness, lang, datatype) captured by the
    WHERE clause."""
    full = _fold_patterns(triples, list(where), max_path_hops, stats=stats)
    for group in optionals:
        gdf = _fold_patterns(triples, group, max_path_hops, stats=stats)
        full = _join(full, gdf, "left")
    for f in filters:
        full = full.filter(F.expr(f))

    def term(t):
        return F.col(_vname(t)) if _is_var(t) else F.lit(t)

    parts = []
    for s, p, o, is_uri in template:
        if _is_var(o):
            v = _vname(o)
            isuri = (
                F.coalesce(F.col(f"_isuri_{v}"), F.lit(False))
                if is_uri is None and f"_isuri_{v}" in full.columns
                else F.lit(bool(is_uri)) if is_uri is not None
                else F.lit(False)
            )
            lang = (
                F.col(f"_lang_{v}")
                if is_uri is None and f"_lang_{v}" in full.columns
                else F.lit(None).cast("string")
            )
            dt = (
                F.col(f"_dt_{v}")
                if is_uri is None and f"_dt_{v}" in full.columns
                else F.lit(None).cast("string")
            )
        else:
            isuri = F.lit(bool(is_uri))
            lang = F.lit(None).cast("string")
            dt = F.lit(None).cast("string")
        parts.append(
            full.select(
                term(s).alias("subj"),
                term(p).alias("pred"),
                term(o).alias("obj"),
                isuri.alias("obj_is_uri"),
                lang.alias("lang"),
                dt.alias("datatype"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    # graph set semantics, same as the store the reference CONSTRUCTs into
    return out.distinct()
