"""Structured-Streaming incremental ingest: Trigger.AvailableNow
drains what's there; a re-run after new files land processes only
the new files (checkpoint carries the done-set — the streaming twin
of the lineage anti-join resume)."""

import os
import tempfile

from ferenda_spark.streaming.ingest import run_extract_stream


def _write_pages(spark, path, lo, hi, n_docs=40):
    from ferenda_spark.sources.pages import synth_pages

    df = synth_pages(spark, n_docs=n_docs, partitions=2)
    part = df.filter(
        (df["url"].substr(-4, 4).cast("int") >= 1000 + lo)
        & (df["url"].substr(-4, 4).cast("int") < 1000 + hi)
    )
    part.write.mode("append").parquet(path)


def test_available_now_incremental(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "pages")
        out = os.path.join(tmp, "docs")
        ckpt = os.path.join(tmp, "ckpt")

        _write_pages(spark, src, 0, 20)
        run_extract_stream(spark, src, out, ckpt)
        first = spark.read.parquet(out)
        n1 = first.count()
        assert n1 == 20
        assert {"url", "extracted_text"} <= set(first.columns)

        # drop 20 more pages; second run must process ONLY those
        _write_pages(spark, src, 20, 40)
        run_extract_stream(spark, src, out, ckpt)
        second = spark.read.parquet(out)
        assert second.count() == 40
        assert second.select("url").distinct().count() == 40  # no reprocessing dups
