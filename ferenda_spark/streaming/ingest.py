"""Incremental ingest via Structured Streaming (Trigger.AvailableNow).

The reference has NO streaming runtime — its incremental behavior is
mtime-based per-doc `needed()` checks plus batch re-runs
(documentstore.py:400-470; SURVEY.md §2.10), which
streaming/resume.py reproduces as lineage anti-joins.  This module
is the *other* idiomatic Spark expression of the same contract:
treat the pages table as an append-only source, process
everything-available-then-stop, and let the checkpoint directory
carry the "which files are done" state that ferenda keeps in
DocumentEntry JSON.  No watermarks or event-time windows are
fabricated — the reference has no late-data semantics.

Use when pages arrive as rolling parquet drops; use resume.py when
re-running over a static snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ferenda_spark.operators.extract import extract_docs
from ferenda_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str, max_files: int = 64) -> DataFrame:
    """Streaming scan of a pages parquet directory.  maxFilesPerTrigger
    bounds micro-batch memory at scale."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def run_extract_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files: int = 64,
) -> None:
    """pages stream → extract stage → parquet sink, processing all
    available input then stopping (Trigger.AvailableNow).  Re-running
    after new files land processes only the new files — the streaming
    twin of resume.run_bucketed_stage's lineage anti-join.  Blocks
    until the batch drains."""
    docs = extract_docs(stream_pages(spark, pages_dir, max_files))
    q = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
