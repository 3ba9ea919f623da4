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


def test_crawl_window_stats_watermark_late_data(spark):
    """Watermarked tumbling windows over warc_ts, append mode:
    a window's row is emitted exactly once (after the watermark,
    carried in the checkpoint, passes its end), and records arriving
    later than the watermark are DROPPED, not re-aggregated."""
    import pandas as pd

    from ferenda_spark.sources.pages import PAGES_SCHEMA
    from ferenda_spark.streaming.ingest import run_crawl_stats_stream

    def rows(ts_mins, host="a.example"):
        return pd.DataFrame(
            {
                "url": [f"https://{host}/{m}" for m in ts_mins],
                "warc_ts": [
                    pd.Timestamp("2026-01-01 00:00:00") + pd.Timedelta(minutes=m)
                    for m in ts_mins
                ],
                "html": [b"<html/>" for _ in ts_mins],
                "text": ["x" for _ in ts_mins],
                "lang": ["en" for _ in ts_mins],
            }
        )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ck"))
        # batch 1: minutes 1,2 (window [0,10)) and 31 (window [30,40))
        spark.createDataFrame(rows([1, 2, 31]), PAGES_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        run_crawl_stats_stream(
            spark, src, out, ckpt, window="10 minutes", watermark="10 minutes"
        )
        got1 = {
            (r.window_start, r.n_pages)
            for r in spark.read.parquet(out).collect()
        }
        # watermark after batch1 = 00:31 - 10min = 00:21 -> only the
        # [00:00,00:10) window is final; [00:30,00:40) still open
        base = pd.Timestamp("2026-01-01 00:00:00").timestamp()
        assert got1 == {(int(base), 2)}

        # batch 2: minute 5 is LATE (< watermark 00:21) and must be
        # dropped; minute 61 advances the watermark past 00:40 and
        # finalizes the [00:30,00:40) window with ONLY its one row
        spark.createDataFrame(rows([5, 61]), PAGES_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        run_crawl_stats_stream(
            spark, src, out, ckpt, window="10 minutes", watermark="10 minutes"
        )
        got2 = {
            (r.window_start, r.n_pages)
            for r in spark.read.parquet(out).collect()
        }
        assert (int(base) + 1800, 1) in got2          # finalized once
        assert (int(base), 2) in got2 and (int(base), 3) not in got2  # late row dropped


def test_dedup_pages_stream(spark):
    """Dedup-on-ingest: first arrival of each (url, content) kept,
    re-fetches dropped — including re-fetches arriving in a LATER
    drop (seen-set carried by the checkpoint); genuinely-changed
    content for the same url passes through."""
    import pandas as pd

    from ferenda_spark.sources.pages import PAGES_SCHEMA
    from ferenda_spark.streaming.ingest import run_dedup_stream

    def drop(path, rows):
        pdf = pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    t = pd.Timestamp("2026-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ckpt"))
        drop(src, [
            ("u1", t, b"<p>a</p>", "a", "en"),
            ("u1", t + m, b"<p>a</p>", "a", "en"),       # exact re-fetch
            ("u1", t + 2 * m, b"<p>B</p>", "B", "en"),   # changed content
            ("u2", t, b"<p>c</p>", "c", "en"),
        ])
        run_dedup_stream(spark, src, out, ckpt, watermark="2 hours")
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert got.filter("url = 'u1'").count() == 2

        # later drop: a dup of already-seen u2 + one new url
        drop(src, [
            ("u2", t + 3 * m, b"<p>c</p>", "c", "en"),   # dup across drops
            ("u3", t + 3 * m, b"<p>d</p>", "d", "en"),
        ])
        run_dedup_stream(spark, src, out, ckpt, watermark="2 hours")
        got = spark.read.parquet(out)
        assert got.count() == 4
        assert got.filter("url = 'u2'").count() == 1
