"""S7 fulltext search layer: typed filters, freetext AND-match,
boosts, pagination over a search-docs projection.

Reference semantics (fulltextindex.py:829-1013 _query_payload):
- field params become term filters; values containing '*' become
  anchored regexes (fulltextindex.py:848-853 escapes '.'/'#' and
  rewrites '*'→'.*' — scalars.wildcard_to_rlike is the superset
  rewrite used here);
- SearchModifier objects (fulltextindex.py:308-335 Less/More/
  Between) become range filters with EXCLUSIVE bounds ({"lt": max},
  {"gt": min} — fulltextindex.py:858-868);
- the wsgiapp layer types raw parameters (wsgiapp.py:500-526):
  'min-X'/'max-X' → More/Less, 'year-X=Y' → Between(Y-1-12-31,
  Y+1-01-01);
- a freetext q is an AND-match over the default fields
  (fulltextindex.py:873-877 default_operator="and"): every token
  must occur; relevance here is the summed token occurrence count
  (the portable restatement of ES TF scoring — deterministic and
  reproducible in the DuckDB oracle, unlike BM25);
- boost_repos multiplies the score for hits of the named repo
  (fulltextindex.py:920-930 function_score weights);
- rows failing the AND-match are excluded (the effect of the
  min_score clause, fulltextindex.py:963-975);
- pagination is from/size over the rank order
  (fulltextindex.py:835-836).

Everything is column expressions over one scan; the only window is
the global rank (top-(pagenum·pagelen) semantics — at scale prefix
with a per-partition top-k, see query.paginate).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.scalars import wildcard_to_rlike


@dataclass(frozen=True)
class Less:
    """fulltextindex.py:314-320 — field < max (exclusive)."""

    max: object


@dataclass(frozen=True)
class More:
    """fulltextindex.py:321-327 — field > min (exclusive)."""

    min: object


@dataclass(frozen=True)
class Between:
    """fulltextindex.py:328-335 — min < field < max (exclusive)."""

    min: object
    max: object


def year_modifier(year: int) -> Between:
    """wsgiapp.py:520-525: 'year-X=2013' → Between(2012-12-31,
    2014-01-01) — the reference's year-bucket range."""
    return Between(date(year - 1, 12, 31), date(year + 1, 1, 1))


def _occurrences(field_col, token: str):
    """Substring occurrence count of `token` in a lowercased field —
    (len(t) - len(replace(t, tok)))/len(tok); exact integer ratio,
    identical arithmetic in the DuckDB twin."""
    t = F.lower(field_col)
    return (F.length(t) - F.length(F.replace(t, F.lit(token)))) / F.lit(len(token))


def apply_filters(df: DataFrame, filters: dict) -> DataFrame:
    """Term / wildcard / range filters (fulltextindex.py:841-868)."""
    for col, spec in (filters or {}).items():
        c = F.col(col)
        if isinstance(spec, Less):
            df = df.filter(c < F.lit(spec.max))
        elif isinstance(spec, More):
            df = df.filter(c > F.lit(spec.min))
        elif isinstance(spec, Between):
            df = df.filter((c > F.lit(spec.min)) & (c < F.lit(spec.max)))
        elif isinstance(spec, str) and "*" in spec:
            df = df.filter(c.rlike(wildcard_to_rlike(spec)))
        else:
            df = df.filter(c == F.lit(spec))
    return df


def _and_match(df: DataFrame, toks: list, q_fields: tuple) -> tuple:
    """AND-semantics freetext match (fulltextindex.py:873-877
    default_operator='and'): every token must occur in some default
    field; returns (filtered df, summed-occurrence score column)."""
    occ_cols = []
    for tok in toks:
        occ = sum(
            (_occurrences(F.col(fld), tok) for fld in q_fields[1:]),
            _occurrences(F.col(q_fields[0]), tok),
        )
        occ_cols.append(occ)
    for occ in occ_cols:
        df = df.filter(occ >= 1)
    score = occ_cols[0]
    for occ in occ_cols[1:]:
        score = score + occ
    return df, score


def _exclude_repos(df: DataFrame, exclude_repos, repo_col: str) -> DataFrame:
    """must_not term filters on the repo field
    (fulltextindex.py:940-947).  NULL repo is not excluded — ES
    must_not(term) only rejects rows where the field HAS the value."""
    if exclude_repos:
        df = df.filter(
            F.coalesce(
                ~F.col(repo_col).isin(list(exclude_repos)), F.lit(True)
            )
        )
    return df


def search(
    docs: DataFrame,
    filters: dict | None = None,
    q: str | None = None,
    q_fields: tuple[str, ...] = ("text",),
    boosts: list[tuple[str, float]] | None = None,
    boost_col: str = "repo",
    id_col: str = "doc_id",
    pagenum: int = 1,
    pagelen: int = 10,
    exclude_repos: list | None = None,
    repo_col: str = "repo",
    include_fragments: bool = False,
    fragment_col: str | None = None,
    ac_query: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Compose filters + freetext AND-match + boosts + pagination.

    Output (id, score, rn) for one result page, ranked by score desc
    with the id as the deterministic tie-break.

    - exclude_repos: drop hits of the named repos
      (fulltextindex.py:940-947 must_not terms);
    - fragment_col + include_fragments=False: return only top-level
      documents — fragments are rows with a non-zero/non-null value
      in fragment_col (the join='parent' filter,
      fulltextindex.py:975-981; non-zero-order fragment test,
      :1000-1004).  ac_query implies fragments stay (autocomplete
      matches section lines, :897-906);
    - ac_query + order_col (no q): rank by the document's natural
      order before score — the reference's identifier-autocomplete
      sort (fulltextindex.py:995-1000 payload sort [order asc,
      _score]).
    """
    df = apply_filters(docs, filters)
    df = _exclude_repos(df, exclude_repos, repo_col)
    if fragment_col is not None and not (include_fragments or ac_query):
        df = df.filter(F.coalesce(F.col(fragment_col), F.lit(0)) == 0)

    score = F.lit(1.0)
    # A q that tokenizes to nothing (e.g. all-whitespace) is the
    # same as no q: no AND-match, constant relevance — the reference
    # sends an empty must-clause list in that case
    # (fulltextindex.py:873-877).
    toks = [t for t in q.lower().split() if t] if q else []
    if toks:
        df, score = _and_match(df, toks, q_fields)

    if boosts:
        mult = F.lit(1.0)
        for value, weight in boosts:
            mult = F.when(F.col(boost_col) == value, F.lit(float(weight))).otherwise(
                mult
            )
        score = score * mult

    sel = [F.col(id_col).alias("id"), score.cast("double").alias("score")]
    if ac_query and not toks and order_col is not None:
        ranked = df.select(*sel, F.col(order_col).alias("_ord"))
        order = [F.asc("_ord"), F.desc("score"), F.asc("id")]
    else:
        ranked = df.select(*sel)
        order = [F.desc("score"), F.asc("id")]
    # Top-(pagenum·pagelen) semantics: orderBy().limit(page-end)
    # compiles to TakeOrderedAndProject (bounded per-partition heaps
    # merged on the driver) — the no-partition row_number window
    # below only ever ranks ≤ page-end rows, never the full filtered
    # result set (same plan as query.paginate).
    lo, hi = (pagenum - 1) * pagelen, pagenum * pagelen
    top = ranked.orderBy(*order).limit(hi)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
        .select("id", "score", "rn")
    )


def search_aggregations(
    docs: DataFrame,
    dims: tuple[str, ...],
    filters: dict | None = None,
    q: str | None = None,
    q_fields: tuple[str, ...] = ("text",),
    exclude_repos: list | None = None,
    repo_col: str = "repo",
    year_dims: tuple[str, ...] = (),
    size: int = 100,
) -> DataFrame:
    """Facet counts over the hit set — the reference attaches an
    aggregation payload to every non-autocomplete search
    (fulltextindex.py:956, :1015-1033 _aggregation_payload): a terms
    aggregation per facet dimension (top `size` values by doc count)
    and a year date-histogram for date-typed dimensions
    (min_doc_count=1 ≙ groupBy emits only seen values).

    Output (dim, value, n) rows.  Plan per dimension: one
    partial-aggregated groupBy over the filtered scan + a
    TakeOrdered top-`size`; the scan is shared via one filtered
    projection, never a per-facet rescan of the raw table."""
    df = apply_filters(docs, filters)
    df = _exclude_repos(df, exclude_repos, repo_col)
    toks = [t for t in q.lower().split() if t] if q else []
    if toks:
        df, _ = _and_match(df, toks, q_fields)

    parts = []
    for d in dims:
        val = (
            F.year(F.col(d)).cast("string")
            if d in year_dims
            else F.col(d).cast("string")
        )
        agg = (
            df.filter(val.isNotNull())
            .groupBy(val.alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("value"))
            .limit(size)
            .select(F.lit(d).alias("dim"), "value", F.col("n").cast("long"))
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def search_parent_child(
    parents: DataFrame,
    children: DataFrame,
    q: str,
    parent_key: str = "doc_id",
    child_parent_key: str = "doc_id",
    filters: dict | None = None,
    parent_fields: tuple[str, ...] = ("text",),
    child_fields: tuple[str, ...] = ("text",),
    role_col: str | None = None,
    exclude_role: str = "autocomplete",
    pagenum: int = 1,
    pagelen: int = 10,
) -> DataFrame:
    """ES has_parent/has_child search restated relationally
    (fulltextindex.py:890-910 submatches + :975-981 parent filter).

    Reference semantics: the index holds parent docs and child
    sections in one join-typed index; a freetext q builds a bool
    SHOULD of [parent matches q, has_child(child matches q AND
    role != 'autocomplete')], only parent rows are returned
    (join='parent' filter), and matching children surface as
    inner_hits on their parent.

    Restatement: typed filters apply to the parent table; a parent
    qualifies when it AND-matches q itself OR has ≥1 qualifying
    child (the has_child clause — a grouped child-match aggregate,
    i.e. a semi-join carrying scores); score = parent occurrence
    score + sum of qualifying children's occurrence scores (the
    deterministic analog of ES sum score_mode), and n_child_hits
    carries the inner_hits count.  Output one page:
    (id, score, n_child_hits, rn).

    Plan shape: child side is one partial-aggregated groupBy on the
    parent key, joined to the filtered parent scan; ranking is
    orderBy+limit (TakeOrderedAndProject) — no global window, no
    driver loop; scale-safe on both sides."""
    toks = [t for t in q.lower().split() if t]
    if not toks:
        # no-q parent/child search degenerates to plain search
        return search(
            parents, filters=filters, q=None, id_col=parent_key,
            pagenum=pagenum, pagelen=pagelen,
        ).select(
            "id", "score", F.lit(0).cast("long").alias("n_child_hits"), "rn"
        )

    def and_match_score(df: DataFrame, fields: tuple[str, ...]):
        """(match_filter, score) for AND-matching toks over fields."""
        occ_cols = []
        for tok in toks:
            occ = sum(
                (_occurrences(F.col(fld), tok) for fld in fields[1:]),
                _occurrences(F.col(fields[0]), tok),
            )
            occ_cols.append(occ)
        matched = occ_cols[0] >= 1
        total = occ_cols[0]
        for occ in occ_cols[1:]:
            matched = matched & (occ >= 1)
            total = total + occ
        return matched, total

    ch = children
    if role_col is not None:
        # fulltextindex.py:900-909 must_not term role=autocomplete
        ch = ch.filter(
            F.col(role_col).isNull() | (F.col(role_col) != exclude_role)
        )
    c_matched, c_score = and_match_score(ch, child_fields)
    child_agg = (
        ch.filter(c_matched)
        .groupBy(F.col(child_parent_key).alias("_pk"))
        .agg(
            F.sum(c_score).alias("_child_score"),
            F.count(F.lit(1)).cast("long").alias("n_child_hits"),
        )
    )

    p = apply_filters(parents, filters)
    p_matched, p_score = and_match_score(p, parent_fields)
    scored = (
        p.join(child_agg, F.col(parent_key) == F.col("_pk"), "left")
        .filter(p_matched | F.col("n_child_hits").isNotNull())
        .select(
            F.col(parent_key).alias("id"),
            (
                F.when(p_matched, p_score).otherwise(F.lit(0.0))
                + F.coalesce(F.col("_child_score"), F.lit(0.0))
            )
            .cast("double")
            .alias("score"),
            F.coalesce(F.col("n_child_hits"), F.lit(0))
            .cast("long")
            .alias("n_child_hits"),
        )
    )
    order = [F.desc("score"), F.asc("id")]
    lo, hi = (pagenum - 1) * pagelen, pagenum * pagelen
    top = scored.orderBy(*order).limit(hi)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
    )


def search_docs(
    doc_rows: DataFrame,
    triples: DataFrame,
    facet_preds: dict[str, str],
    uri_col: str = "doc_uri",
) -> DataFrame:
    """The S7 sink projection: one row per document joined with its
    facet predicate values pivoted to typed columns (the reference
    indexes each doc's facet fields at relate time,
    documentrepository.py:2155-2192 relate_fulltext).

    `facet_preds` maps output column name → predicate URI; the pivot
    is a stable-schema conditional aggregation (no driver-side
    distinct scan), min() as the deterministic pick for multi-valued
    predicates."""
    aggs = [
        F.min(F.when(F.col("pred") == pred, F.col("obj"))).alias(name)
        for name, pred in facet_preds.items()
    ]
    facets = (
        triples.filter(F.col("pred").isin(list(facet_preds.values())))
        .groupBy(F.col("subj").alias(uri_col))
        .agg(*aggs)
    )
    return doc_rows.join(facets, uri_col, "left")
