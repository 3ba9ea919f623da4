"""Stateful recrawl change detection (streaming/stateful.py).

Streaming evidence for the reference's needed() skip
(documentstore.py:400-470): per-url state carries the last content
fingerprint across micro-batches AND across checkpoint restarts, so
unchanged re-crawls never re-enter the pipeline.  The batch twin is
value-checked against the same expectation the DuckDB oracle
(`recrawl_changes`) encodes.
"""

import datetime as dt
import os
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from ferenda_spark.sources.pages import PAGES_SCHEMA
from ferenda_spark.streaming.stateful import changed_pages_stream, changed_rows


def _page(url, ts, html, text, lang="en"):
    return Row(
        url=url,
        warc_ts=dt.datetime(2024, 1, ts, tzinfo=dt.timezone.utc),
        html=html,
        text=text,
        lang=lang,
    )


def _drop(spark, path, rows):
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_available_now(spark, src, ckpt, out):
    """Run the stream to completion over all currently-available
    files (one micro-batch per dropped file) into a parquet sink —
    the memory sink cannot recover from a checkpoint, parquet can."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per drop
        .parquet(src)
    )
    q = (
        changed_pages_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _emitted(spark, out):
    return {
        (r["url"], r["change_kind"], r["warc_ts"].day)
        for r in spark.read.parquet(out).collect()
    }


def test_changed_pages_stream_state_across_batches_and_restarts(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "pages")
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "out")

        # drop 1: A and B appear
        _drop(
            spark,
            src,
            [_page("u://a", 1, b"<p>A1</p>", "A1"), _page("u://b", 1, b"<p>B1</p>", "B1")],
        )
        # drop 2 (separate file = separate micro-batch):
        # A unchanged (same bytes), B changed, C new
        _drop(
            spark,
            src,
            [
                _page("u://a", 2, b"<p>A1</p>", "A1"),
                _page("u://b", 2, b"<p>B2</p>", "B2"),
                _page("u://c", 2, b"<p>C1</p>", "C1"),
            ],
        )
        _run_available_now(spark, src, ckpt, out)
        got = _emitted(spark, out)
        # A emitted once (new), NOT re-emitted for the unchanged recrawl
        assert got == {
            ("u://a", "new", 1),
            ("u://b", "new", 1),
            ("u://b", "changed", 2),
            ("u://c", "new", 2),
        }

        # drop 3 + RESTART with the same checkpoint: state must be
        # restored (A still unchanged -> silent; C changed -> emitted)
        _drop(
            spark,
            src,
            [_page("u://a", 3, b"<p>A1</p>", "A1"), _page("u://c", 3, b"<p>C2</p>", "C2")],
        )
        _run_available_now(spark, src, ckpt, out)
        got2 = _emitted(spark, out) - got
        assert got2 == {("u://c", "changed", 3)}


def test_changed_pages_multi_version_single_batch(spark):
    """Several versions of one url inside ONE micro-batch resolve in
    warc_ts order: A1 -> A1 (dup, dropped) -> A2 (changed)."""
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "pages")
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "out")
        _drop(
            spark,
            src,
            [
                _page("u://a", 3, b"<p>A2</p>", "A2"),
                _page("u://a", 1, b"<p>A1</p>", "A1"),
                _page("u://a", 2, b"<p>A1</p>", "A1"),
            ],
        )
        _run_available_now(spark, src, ckpt, out)
        got = sorted(
            (d, k) for _, k, d in _emitted(spark, out)
        )
        assert got == [(1, "new"), (3, "changed")]


def test_changed_rows_batch_twin(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, 10, "view"),
            ("u1", 2, 11, "view"),   # unchanged -> dropped
            ("u1", 3, 12, "buy"),    # changed
            ("u2", 1, 13, "view"),   # new key
        ],
        "key string, ts int, id int, fp string",
    )
    out = changed_rows(df, "key", "ts", "fp", tiebreak_col="id")
    got = {(r["key"], r["ts"], r["change_kind"]) for r in out.collect()}
    assert got == {("u1", 1, "new"), ("u1", 3, "changed"), ("u2", 1, "new")}
    # plan stays JVM-side: window + filter, no Python workers
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_changed_rows_null_fingerprints_excluded(spark):
    """NULL fingerprints carry no content identity: the row is
    excluded up front, and it must NOT poison the next row's lag
    (which would mislabel it 'new' and lose the unchanged-skip)."""
    df = spark.createDataFrame(
        [
            ("u1", 1, 10, "A"),
            ("u1", 2, 11, None),   # no identity -> excluded
            ("u1", 3, 12, "A"),    # unchanged vs ts=1 -> dropped
            ("u1", 4, 13, "B"),    # changed
            ("u2", 1, 14, None),   # a key with ONLY null fps emits nothing
        ],
        "key string, ts int, id int, fp string",
    )
    out = changed_rows(df, "key", "ts", "fp", tiebreak_col="id")
    got = {(r["key"], r["ts"], r["change_kind"]) for r in out.collect()}
    assert got == {("u1", 1, "new"), ("u1", 4, "changed")}
