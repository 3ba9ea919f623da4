"""Multi-executor KG throughput: the north rule's N vs 4N *executor*
evidence on one host via Spark's local-cluster mode (separate
executor JVMs, real inter-executor shuffle/broadcast paths — unlike
local[N]'s single shared JVM).

Usage:
    python tools/cluster_bench.py <n_executors> [pages_parquet]

Each executor is 4 cores / 12g heap, so <n_executors> IS the cluster
size knob: 1 vs 4 executors = N vs 4N.  Prints one JSON line.

Deployment conf this surfaced (documented in session.py too):
`spark.python.worker.reuse=false` on multi-executor clusters — a
reused worker's Arrow stdin-reader allocator trips a "Memory was
leaked by query" task failure on real executors; invisible in
local[] mode where the completion listener's throw is tolerated.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cluster_session(n_exec: int, cores: int = 4, exec_mem: str = "12g") -> SparkSession:
    return (
        SparkSession.builder.master(
            f"local-cluster[{n_exec},{cores},{16 * 1024}]"
        )
        .appName("cluster_bench")
        .config("spark.sql.shuffle.partitions", str(cores * n_exec))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "8g")
        # local-cluster's bracket memory is the WORKER allocation;
        # the executor heap must be set explicitly or it runs at 1g
        .config("spark.executor.memory", exec_mem)
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.python.worker.reuse", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )


def main() -> None:
    n_exec = int(sys.argv[1])
    corpus = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "build", "bench_pages_100000")
    )
    spark = cluster_session(n_exec)
    spark.sparkContext.setLogLevel("ERROR")
    from ferenda_spark.pipeline import build_kg

    pages = spark.read.parquet(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = pages.count()
    reps = int(os.environ.get("BENCH_KG_REPS", "2"))
    best = None
    for _ in range(max(1, reps)):
        spark.catalog.clearCache()
        pages = spark.read.parquet(corpus).persist(StorageLevel.MEMORY_AND_DISK)
        pages.count()
        t0 = time.time()
        kg = build_kg(spark, pages)
        n_triples = kg.triples.count()
        secs = time.time() - t0
        best = secs if best is None else min(best, secs)
    print(
        json.dumps(
            {
                "mode": f"local-cluster[{n_exec},4]",
                "executors": n_exec,
                "docs": n_docs,
                "triples": n_triples,
                "pipeline_sec": round(best, 3),
                "triples_per_sec": round(n_triples / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
