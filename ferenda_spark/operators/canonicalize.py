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


def connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """edges(src, dst) -> canon_map(uri, canon_uri).

    canon_uri is the lexicographically smallest member of each
    component; every member (including the root) gets a row.
    """
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        return e.select(
            F.col("u").alias("uri"), F.col("v").alias("canon_uri")
        )
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
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


def rewrite_triples(triples: DataFrame, canon_map: DataFrame) -> DataFrame:
    """Rewrite subj and (URI-valued) obj through the canonical map,
    then dropDuplicates — ferenda's equivs-dict rewrite
    (graphanalyze.py:271-277) generalized to the full closure.

    owl:sameAs statements are consumed here: after rewriting they
    would collapse into self-loops, so they are dropped — the
    canon_map table itself is the canonical record of equivalence.

    Two left joins + coalesce; canon_map is usually small relative
    to triples (only duplicated URIs appear), so AQE broadcasts it
    when it fits — no explicit hint, because a forced broadcast
    would OOM when the duplicate-URI population grows; past the
    threshold this degrades gracefully to a shuffle join on
    already-bucketed subj."""
    from ferenda_spark.config import OWL_SAMEAS

    triples = triples.filter(F.col("pred") != OWL_SAMEAS)
    cm_s = canon_map.select(
        F.col("uri").alias("subj"), F.col("canon_uri").alias("_cs")
    )
    cm_o = canon_map.select(
        F.col("uri").alias("obj"), F.col("canon_uri").alias("_co")
    )
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
