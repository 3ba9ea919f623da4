"""Query layer: facets, TOC groupings, stats, rankings, pagination.

Reference semantics (SURVEY.md §2.5-2.8): ferenda's query side is
SPARQL SELECTs + Python dict/group loops over the accumulated graph
(documentrepository.py:2260-2423 faceted_data/facet_query,
:2881-3021 toc_pagesets/toc_select_for_pages, wsgiapp.py:232-386
stats, graphanalyze.py:268-328 citation counts, :537-575 degree
distribution, :896-921 pagerank ranking). Here each is a declarative
DataFrame plan — Catalyst handles pushdown/pruning/broadcast; the
iterative PageRank is the only driver-side loop.

Every function takes and returns DataFrames; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def round_portable(col, n: int):
    """Engine-portable half-up rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
    Built-in round() differs between engines exactly at half
    boundaries of the double's decimal expansion; this formula is a
    fixed IEEE op sequence, so any engine produces the same bits.
    Positive inputs only."""
    scale = float(10**n)
    return (F.floor(col * scale + 0.5) / scale).alias(f"_r{n}")


# ------------------------------------------------------------------ P7: facets

def facet_pivot(df: DataFrame, key: str, facet: str, values: list[str]) -> DataFrame:
    """SPARQL SELECT-with-OPTIONALs restated as a pivot
    (documentrepository.py:2318-2408): one row per `key`, one count
    column per known facet value.  `values` is passed explicitly so
    the plan needs no extra distinct-scan job and the output schema
    is stable (required for 10^12-row plans: a dynamic pivot would
    collect the value set to the driver first).
    """
    aggs = [
        F.coalesce(F.sum(F.when(F.col(facet) == v, F.lit(1)).cast("long")), F.lit(0))
        .cast("long")
        .alias(v)
        for v in values
    ]
    return df.groupBy(key).agg(*aggs)


# ------------------------------------------------------------ A1/A2: TOC pages

def title_sortkey(col):
    """facet.py:195-210 titlesortkey → util.title_sortkey
    (util.py:724-737): lowercase, strip a leading 'the ', drop
    non-word chars.  Python's \\W is Unicode-aware and keeps '_', so
    the Java-regex restatement is [^\\p{L}\\p{N}_] — 'Öga' keeps its
    ö (and buckets under the 'ö' TOC letter) instead of collapsing
    to '-'."""
    k = F.regexp_replace(F.lower(col), "^the ", "")
    return F.regexp_replace(k, r"[^\p{L}\p{N}_]", "")


def firstletter(col):
    """facet.py:212-232 firstletter: first sortkey char, '-' if empty."""
    k = title_sortkey(col)
    return F.when(F.length(k) > 0, F.substring(k, 1, 1)).otherwise(F.lit("-"))


def toc_pagesets(df: DataFrame, title_col: str) -> DataFrame:
    """A1 toc_pagesets: distinct selector values + member counts.
    Output: (letter, n_items)."""
    return (
        df.select(firstletter(F.col(title_col)).alias("letter"))
        .groupBy("letter")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )


def toc_select_for_pages(
    df: DataFrame,
    title_col: str,
    id_col: str,
    per_page: int = 3,
    collate_locale: str | None = None,
    icu: bool = False,
) -> DataFrame:
    """A2 toc_select_for_pages: group rows by selector, keep the
    first `per_page` per group ordered by title sortkey (ties by id).
    Window row_number, not a driver-side group loop.

    `collate_locale` switches the sortkey to the locale collation
    key (documentrepository.py:2950-2952 sorts TOC values with
    locale.strxfrm under repo.collate_locale) — e.g. 'sv_SE' puts
    å/ä/ö after z in the correct order, entirely JVM-side.  With
    `icu=True` the sortkey is Spark 4's native ICU COLLATE
    expression instead of the translate approximation (full
    tailoring: v/w interleaving, ß, œ/æ weights)."""
    from ferenda_spark.functions.scalars import collation_key, icu_collation_col

    if collate_locale and icu:
        sortkey = icu_collation_col(F.col(title_col), collate_locale)
    elif collate_locale:
        sortkey = collation_key(F.col(title_col), collate_locale)
    else:
        sortkey = title_sortkey(F.col(title_col))
    w = Window.partitionBy("letter").orderBy("sortkey", id_col)
    return (
        df.select(
            firstletter(F.col(title_col)).alias("letter"),
            sortkey.alias("sortkey"),
            F.col(title_col).alias("title"),
            F.col(id_col),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= per_page)
        .drop("sortkey")
    )


# ----------------------------------------------------------------- A4: stats

def stats_slices(df: DataFrame, dimension: str, uri_col: str) -> DataFrame:
    """wsgiapp.py:312-386 stats_slice: per (dimension, observation)
    count of distinct uris.  Output (observation, n) per dimension
    value."""
    return (
        df.groupBy(F.col(dimension).alias("observation"))
        .agg(F.countDistinct(uri_col).cast("long").alias("n"))
    )


# ------------------------------------------------- A5/A6: citation analytics

def citation_topk(
    edges: DataFrame, dst: str, k: int = 20, canon: DataFrame | None = None
) -> DataFrame:
    """graphanalyze.py:268-328: count citing docs per (canonicalized)
    target, top-k by count desc (ties by target asc for
    determinism).  canon(uri, canon_uri) rewrites dst first."""
    e = edges
    if canon is not None:
        e = (
            e.join(canon, e[dst] == canon["uri"], "left")
            .withColumn(dst, F.coalesce("canon_uri", dst))
            .drop("uri", "canon_uri")
        )
    return (
        e.groupBy(F.col(dst).alias("target"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_citing"))
        .orderBy(F.desc("n_citing"), F.asc("target"))
        .limit(k)
    )


def degree_histogram(edges: DataFrame, dst: str) -> DataFrame:
    """graphanalyze.py:537-575: in-degree per node, then histogram of
    degrees. Two groupBys; the second input is |V| rows, trivially
    small after the first aggregation."""
    deg = edges.groupBy(dst).agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))


# ------------------------------------------------------------- W1: PageRank

def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """graphanalyze.py:896-921 ranks a citation digraph by pagerank.
    Iterative DataFrame loop (SURVEY.md §4 item 3): contributions =
    ranks ⋈ out-edges, groupBy(dst).sum; dangling mass redistributed
    uniformly so the ranks stay a probability distribution.
    localCheckpoint every few rounds truncates plan lineage —
    without it the plan doubles per iteration and Catalyst analysis
    time dominates at scale.

    Returns (node, rank: double). Deterministic given the edge set.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # size-aware state partitioning: iteration state for a small
    # graph in 1 partition, growing with |V| up to the session cap —
    # per-iteration micro-shuffles otherwise dominate wall clock
    sc = edges.sparkSession.sparkContext
    part = max(1, min(sc.defaultParallelism * 4, n_nodes // 100_000 + 1))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iterations):
        # contribs is consumed twice (dangling scalar + next ranks):
        # eager-checkpoint it so neither consumer re-runs the chain —
        # a lazy broadcast subquery here re-evaluates every prior
        # iteration once per consumer and goes super-linear
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "inner")
            .join(e, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
            .coalesce(part)
            .localCheckpoint()
        )
        total_inflow = contribs.agg(F.sum("inflow")).first()[0] or 0.0
        dangling = max(0.0, 1.0 - total_inflow)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.coalesce(part).localCheckpoint()
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    checkpoint_every: int = 1,
) -> DataFrame:
    """graphanalyze.py:907-921 ranks by HITS authorities: alternating
    auth(v) = Σ hub(u) over in-edges, hub(u) = Σ auth(v) over
    out-edges, L2-normalized each half-step (Kleinberg '99, public
    literature).  Two aggregations per iteration; same checkpoint
    discipline as pagerank.  Returns (node, authority, hub)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    scores = nodes.select("node", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub"))
    sc = edges.sparkSession.sparkContext
    n_nodes = nodes.count()
    part = max(1, min(sc.defaultParallelism * 4, n_nodes // 100_000 + 1))

    def _l2(df: DataFrame, col: str) -> DataFrame:
        # eager-checkpoint before the norm scalar: the df is consumed
        # twice (norm + normalized output) and lazily it would re-run
        # the whole iteration chain per consumer
        df = df.coalesce(part).localCheckpoint()
        norm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))).first()[0] or 1.0
        return df.withColumn(col, F.col(col) / F.lit(norm))

    for i in range(iterations):
        auth = (
            scores.join(e, scores["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        scores = _l2(
            nodes.join(auth, "node", "left")
            .join(scores.select("node", "hub"), "node", "left")
            .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth"), "hub"),
            "auth",
        )
        hub = (
            scores.join(e, scores["node"] == e["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        scores = _l2(
            nodes.join(hub, "node", "left")
            .join(scores.select("node", "auth"), "node", "left")
            .select("node", "auth", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub",
        )
        if (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()
    return scores


def average_precision(
    ranked: DataFrame, gold: DataFrame, query_col: str, item_col: str, rank_col: str
) -> DataFrame:
    """W3 IR evaluation (graphanalyze.py:760-806): AP per query =
    mean over relevant hits of precision@hit-rank; MAP is the mean
    of this output.  `ranked` carries (query, item, rank); `gold`
    carries the relevant (query, item) pairs.  Pure window algebra —
    no driver loop."""
    w = Window.partitionBy(query_col).orderBy(rank_col)
    hitsdf = ranked.join(gold, [query_col, item_col], "left_semi")
    prec = hitsdf.withColumn("hit_no", F.row_number().over(w)).withColumn(
        "prec_at", F.col("hit_no").cast("double") / F.col(rank_col)
    )
    n_gold = gold.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))
    return (
        prec.groupBy(query_col)
        .agg(F.sum("prec_at").alias("sum_prec"))
        .join(n_gold, query_col, "right")
        .select(
            query_col,
            (F.coalesce("sum_prec", F.lit(0.0)) / F.col("n_rel")).alias("ap"),
        )
    )


# ----------------------------------------------- W4/W5: pagination & windows

def paginate(df: DataFrame, order_cols: list, pagenum: int, pagelen: int) -> DataFrame:
    """fulltextindex.py:835-836 / wsgiapp.py:634-660 pager: one page
    of the global sort order.

    Pagination is a top-(pagenum·pagelen) problem, so the plan is
    orderBy(...).limit(page-end) — Catalyst compiles that to
    TakeOrderedAndProject: every partition keeps a bounded
    page-end-sized heap map-side and the driver merges heaps; no
    global sort, no full shuffle, and the no-partition row_number
    window that assigns ranks only ever sees ≤ page-end rows.  The
    order MUST be fully tie-broken (as all catalog callers do) for
    the page slice to be deterministic."""
    lo, hi = (pagenum - 1) * pagelen, pagenum * pagelen
    top = df.orderBy(*order_cols).limit(hi)
    w = Window.orderBy(*order_cols)
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
    )


def feed_archive_windows(df: DataFrame, order_cols: list, archivesize: int = 100) -> DataFrame:
    """documentrepository.py:3553-3575 fixed-size archive pages:
    bucket = floor((rn-1)/archivesize). Returns per-bucket counts.

    The per-bucket COUNTS are order-independent — page i holds
    min(archivesize, n - i·archivesize) entries for any total n —
    so no row numbering (and no global no-partition window, which
    would single-reduce the whole entry set at scale) is needed:
    one partial-aggregated global count, then a 1-row
    sequence+explode generates the page rows arithmetically.
    `order_cols` only ever decided *membership*, which counts don't
    see; the parameter is kept for API compatibility."""
    del order_cols  # membership order does not affect counts
    n = df.agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 0)
    pages = n.select(
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / archivesize))
        ).alias("archive_page"),
        "n",
    )
    return pages.select(
        F.col("archive_page").cast("long").alias("archive_page"),
        F.least(
            F.lit(archivesize),
            F.col("n") - F.col("archive_page") * archivesize,
        )
        .cast("long")
        .alias("n_entries"),
    )


# ------------------------------------------- J2: facets ⋈ entries decoration

def decorate_entries(
    faceted: DataFrame, entries: DataFrame, uri_col: str = "uri"
) -> DataFrame:
    """J2 news_facet_entries (documentrepository.py:3210-3243):
    decorate each news entry with its faceted-data row.  Entries
    whose uri does not occur in the faceted data are DROPPED (the
    reference warns and skips, :3219-3224 — surface them with
    `entry_mismatches` below); the join is an inner equi-join, so
    the result carries the entry's columns plus the facet columns."""
    return entries.join(faceted, uri_col, "inner")


def entry_mismatches(
    faceted: DataFrame, entries: DataFrame, uri_col: str = "uri"
) -> DataFrame:
    """The warn-and-drop set of decorate_entries: entries missing
    from the faceted data (documentrepository.py:3219-3224 warning
    path) — an anti-join, for the caller's log/metrics."""
    return entries.join(faceted.select(uri_col), uri_col, "left_anti")


# --------------------------------------------------- J5: composite resolution

def composite_union_dedup(
    dfs: list[DataFrame], key: str, priority_col: str = "source_priority"
) -> DataFrame:
    """compositerepository.py:29-47: union subrepo doc sets, first
    subrepo wins per key.  unionByName + row_number over priority."""
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    w = Window.partitionBy(key).orderBy(priority_col)
    return u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
