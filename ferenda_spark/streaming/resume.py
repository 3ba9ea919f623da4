"""Per-partition lineage + checkpoint-resume.

Reference semantics: ferenda's freshness layer is per-doc
DocumentEntry timestamps + needed() mtime checks
(documentstore.py:400-470, documententry.py:27-160) — killed runs
re-process only stale documents. The Spark restatement (north rule:
"resumable from checkpoint with per-partition lineage + metrics"):

- every stage output is hash-bucketed on url (`url_bucket`) and
  written with dynamic partition overwrite, so re-writing a bucket is
  idempotent;
- after each bucket lands, a lineage row (run_id, stage, bucket,
  n_rows, started, finished, status) is appended;
- on resume, the pending set = all buckets ANTI-JOIN lineage 'ok'
  rows for that stage — only unfinished buckets recompute.

At 10^12 pages the bucket count rises and buckets become Iceberg
partitions; the mechanism is unchanged.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("started", T.TimestampType(), False),
        T.StructField("finished", T.TimestampType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def with_bucket(df: DataFrame, n_buckets: int, col: str = "url") -> DataFrame:
    return df.withColumn(
        "url_bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    )


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    if not _exists(lineage_path):
        return None
    return spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_path)


def done_buckets(spark: SparkSession, lineage_path: str, stage: str) -> set[int]:
    lin = read_lineage(spark, lineage_path)
    if lin is None:
        return set()
    rows = (
        lin.filter((F.col("stage") == stage) & (F.col("status") == "ok"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def run_bucketed_stage(
    spark: SparkSession,
    stage: str,
    df: DataFrame,
    out_path: str,
    lineage_path: str,
    run_id: str,
    n_buckets: int,
    resume: bool = True,
) -> DataFrame:
    """Write `df` (must carry url_bucket) partitioned by bucket,
    skipping buckets already recorded ok; append lineage rows. Returns
    the (full) stage table, read back from storage."""
    started = datetime.now(timezone.utc)
    done = done_buckets(spark, lineage_path, stage) if resume else set()
    pending = [b for b in range(n_buckets) if b not in done]
    if pending:
        out = df
        if done:
            out = df.filter(~F.col("url_bucket").isin(sorted(done)))
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.mode("overwrite").partitionBy("url_bucket").parquet(out_path)
        finished = datetime.now(timezone.utc)
        written = spark.read.parquet(out_path).filter(
            F.col("url_bucket").isin(pending)
        )
        counts = {
            r["url_bucket"]: r["count"]
            for r in written.groupBy("url_bucket").count().collect()
        }
        rows = [
            (run_id, stage, int(b), int(counts.get(b, 0)), started, finished, "ok")
            for b in pending
        ]
        spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(lineage_path)
    return spark.read.parquet(out_path)


def run_global_stage(
    spark: SparkSession,
    stage: str,
    df_fn,
    out_path: str,
    lineage_path: str,
    run_id: str,
    resume: bool = True,
) -> DataFrame:
    """Non-bucketed stage (CC, global dedup): one lineage row with
    partition_id=-1; skipped entirely when already ok."""
    if resume and -1 in done_buckets(spark, lineage_path, stage) and _exists(out_path):
        return spark.read.parquet(out_path)
    started = datetime.now(timezone.utc)
    df = df_fn()
    df.write.mode("overwrite").parquet(out_path)
    finished = datetime.now(timezone.utc)
    n = spark.read.parquet(out_path).count()
    spark.createDataFrame(
        [(run_id, stage, -1, int(n), started, finished, "ok")], LINEAGE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(lineage_path)
    return spark.read.parquet(out_path)


def _exists(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for f in _walk_files(path)
    )


def _walk_files(path: str):
    for root, _dirs, files in os.walk(path):
        for f in files:
            yield f


def new_run_id() -> str:
    return f"run-{int(time.time() * 1000):x}"
