"""sameAs canonicalization: connected components + triple rewrite.

Reference semantics: ferenda loads an owl:sameAs graph and rewrites
URIs through a 1-hop equivalence dict
(sources/general/graphanalyze.py:171-176, 271-277) and expands
sameAs closures in queries (:178-225). At web scale the closure is a
*connected components* problem; we use the alternating
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public literature),
which converges in O(log d) rounds, so the deliberately huge chain
component (FIXTURES.md §4) costs ~log(n) shuffles, not n.

Skew note: both stars are groupBy-min aggregations — Spark performs
partial (map-side) aggregation, so a hot component's key does not
concentrate rows on one reducer the way a join would; no manual
salting needed here. Each round localCheckpoints to truncate plan
lineage (SURVEY.md §4 item 3).

Component label = lexicographic min member ("canonical URI").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    sym = (
        e.select("u", "v")
        .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
    m = F.least(F.col("u"), F.col("minv")).alias("m")
    return (
        sym.join(mins, "u")
        .select("u", "v", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        o.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    root = mins.select("u", F.col("m").alias("v"))
    return rewired.union(root).distinct()


def _driver_cc(spark, rows) -> DataFrame:
    """Union-find on the driver for dimension-sized edge sets: one
    job (the caller's limit-probe collect) instead of ~2 per star
    round — the iterative distributed algorithm costs O(rounds)
    driver round-trips, which becomes the pipeline's Amdahl serial
    floor when the equivalence population is tiny (the common case:
    only multi-minted entities produce sameAs edges)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = find(row["u"]), find(row["v"])
        if a != b:
            # union by label order so the root is always the min —
            # the component label IS the lexicographic min member
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    srt = sorted((x, find(x)) for x in parent)
    all_nodes = {x for x, _ in srt} | {r for _, r in srt}
    out = sorted((x, find(x)) for x in all_nodes)
    return spark.createDataFrame(out, "uri string, canon_uri string")


def connected_components(
    edges: DataFrame, max_iter: int = 30, driver_threshold: int = 100_000
) -> DataFrame:
    """edges(src, dst) -> canon_map(uri, canon_uri).

    canon_uri is the lexicographically smallest member of each
    component; every member (including the root) gets a row.

    Size-aware strategy (same principle as the rewrite broadcast):
    an edge set under `driver_threshold` is solved with driver-side
    union-find — identical output, two jobs; larger sets run the
    distributed large-star/small-star iteration, whose O(log d)
    rounds are the only scale-safe option when the closure itself
    exceeds driver memory.  The threshold counts DISTINCT UNDIRECTED
    edges (the count runs after the dedup below); the 100k default
    keeps the collected Python Row list in the tens-of-MB range —
    well clear of the multi-GB object-overhead cliff a
    million-edge-of-URIs collect would sit on."""
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # ONE job decides the strategy AND feeds the driver path: a
    # limit-probe collect returns the complete edge set iff it is
    # under the threshold (the limit didn't truncate) — replacing
    # the former checkpoint+count+collect triple, which cost three
    # driver round-trips on the latency-critical small case
    probe = e.limit(driver_threshold + 1).collect()
    if len(probe) == 0:
        return e.select(
            F.col("u").alias("uri"), F.col("v").alias("canon_uri")
        )
    if len(probe) <= driver_threshold:
        return _driver_cc(e.sparkSession, probe)
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for i in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # convergence probe every OTHER round: the probe is a driver
        # action, and on a shrinking edge set an extra star round is
        # cheaper than an extra round-trip — halving the serial
        # driver fraction that caps scaling at high core counts
        if i % 2 == 0:
            continue
        sig = e.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        cur = (sig["n"], sig["h"])
        if cur == prev_sig:
            break
        prev_sig = cur
    members = e.select(F.col("u").alias("uri"), F.col("v").alias("canon_uri"))
    roots = e.select(F.col("v").alias("uri")).distinct().withColumn(
        "canon_uri", F.col("uri")
    )
    return members.union(roots).distinct()


def rewrite_triples(
    triples: DataFrame,
    canon_map: DataFrame,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Rewrite subj and (URI-valued) obj through the canonical map,
    then dropDuplicates — ferenda's equivs-dict rewrite
    (graphanalyze.py:271-277) generalized to the full closure.

    owl:sameAs statements are consumed here: after rewriting they
    would collapse into self-loops, so they are dropped — the
    canon_map table itself is the canonical record of equivalence.

    Two left joins + coalesce.  The broadcast decision is made
    explicitly from the canon map's measured row count (it is CC
    output, already materialized by localCheckpoint, so the count is
    a cheap cached-scan action): a small map broadcasts — skipping
    two full shuffle writes of the triples table, which even AQE's
    runtime conversion would pay — while a map past the threshold
    falls back to a shuffle join rather than forcing an OOM-risk
    broadcast.  This replaces both the unconditional hint (OOM at
    100× duplicate populations) and the hint-free plan (measured 2×
    pipeline slowdown at 250k docs from the wasted shuffle writes).
    """
    from ferenda_spark.config import OWL_SAMEAS

    triples = triples.filter(F.col("pred") != OWL_SAMEAS)
    cm_s = canon_map.select(
        F.col("uri").alias("subj"), F.col("canon_uri").alias("_cs")
    )
    cm_o = canon_map.select(
        F.col("uri").alias("obj"), F.col("canon_uri").alias("_co")
    )
    if canon_map.count() <= broadcast_threshold:
        cm_s, cm_o = F.broadcast(cm_s), F.broadcast(cm_o)
    return (
        triples.join(cm_s, "subj", "left")
        .join(cm_o, "obj", "left")
        .select(
            F.coalesce(F.col("_cs"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.when(F.col("obj_is_uri"), F.coalesce(F.col("_co"), F.col("obj")))
            .otherwise(F.col("obj"))
            .alias("obj"),
            F.col("obj_is_uri"),
            F.col("lang"),
            F.col("datatype"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )
