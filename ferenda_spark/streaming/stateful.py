"""Stateful recrawl change detection (applyInPandasWithState).

The reference decides per document whether work is `needed()` by
comparing the source against what the DocumentEntry last recorded
(/root/reference/ferenda/documentstore.py:400-470;
/root/reference/ferenda/documententry.py:50 `orig_updated`): an
unchanged re-download is skipped, a changed or never-seen one flows
through parse→relate→generate.  At 10^12 Common-Crawl-style pages
the same contract is a *streaming* concern — recrawl batches arrive
forever, and the "what did I last see for this url" record is
keyed state, not an mtime on disk.

Spark-first restatement: `changed_pages_stream` groups the pages
stream by url and runs an Arrow-batched stateful function
(`applyInPandasWithState`) whose per-url state is the last content
fingerprint.  Only new/changed pages are emitted, so everything
downstream (the whole KG pipeline) processes deltas.  State lives
in the state store (RocksDB-backed on a real cluster — set
`spark.sql.streaming.stateStore.providerClass` to the RocksDB
provider so 10^9+ keys spill off-heap) and survives restarts via
the checkpoint, which is exactly the DocumentEntry contract.

`changed_rows` is the batch twin over a static snapshot — a pure
lag-window plan (shuffle on key, no Python) used by the
`recrawl_changes` catalog query so the semantics get a DuckDB
oracle; the streaming operator is pytest-evidenced (state across
micro-batches and across checkpoint restarts).

Scale notes: state size is O(distinct urls) × ~100 bytes; the
shuffle key is url (same hash partitioning as the rest of the
pipeline, SURVEY.md §4); within a micro-batch rows are ordered by
warc_ts so multi-version batches resolve deterministically.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

CHANGED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("change_kind", StringType()),  # 'new' | 'changed'
    ]
)

# last seen fingerprint + how many versions this url has produced
STATE_SCHEMA = StructType(
    [StructField("last_fp", StringType()), StructField("n_seen", LongType())]
)


def _fingerprint(html: bytes | None, text: str | None) -> str:
    """Content fingerprint: sha256 of raw html when present, else of
    the extracted text (mirrors the reference's 'source file changed'
    check, which reads the downloaded bytes)."""
    import hashlib

    payload = html if html is not None else (text or "").encode("utf-8")
    return hashlib.sha256(payload).hexdigest()


def _changed_fn(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import heapq
    from operator import attrgetter

    last_fp, n_seen = state.get if state.exists else (None, 0)
    out = []
    # a url with more rows than one Arrow chunk arrives as SEVERAL
    # pdfs, each internally unordered w.r.t. the others — the global
    # warc_ts order must hold over the whole group, or an older
    # version in a later chunk would be processed after (and leave
    # its stale fingerprint over) a newer one.  Bounded merge: each
    # chunk is stably sorted on its own, then heapq.merge streams
    # the k sorted chunks in global order (stable — ties yield from
    # earlier chunks first, matching a stable sort of the concat).
    # All k chunks are still simultaneously resident (the merge
    # needs every iterator open), but we never build the 2×-sized
    # concatenated copy — peak memory for a very-hot url is the
    # group itself, not double it.
    frames = [
        f.sort_values("warc_ts", kind="mergesort") for f in pdfs if len(f)
    ]
    merged = heapq.merge(
        *(f.itertuples(index=False) for f in frames),
        key=attrgetter("warc_ts"),
    )
    for row in merged:
        fp = _fingerprint(row.html, row.text)
        if fp == last_fp:
            continue
        out.append(
            (
                row.url,
                row.warc_ts,
                row.text,
                row.lang,
                "new" if n_seen == 0 else "changed",
            )
        )
        last_fp = fp
        n_seen += 1
    state.update((last_fp, n_seen))
    if out:
        yield pd.DataFrame(
            out, columns=["url", "warc_ts", "text", "lang", "change_kind"]
        )


def changed_pages_stream(pages: DataFrame) -> DataFrame:
    """Streaming delta filter over a pages stream: emit each url's
    page only when its content fingerprint differs from the last
    emitted version (state store), i.e. the reference's needed()
    skip expressed as a stateful operator."""
    return pages.groupBy("url").applyInPandasWithState(
        _changed_fn,
        CHANGED_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def changed_rows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    fingerprint_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch twin on a static snapshot: rows whose fingerprint
    differs from the previous row of the same key in ts order.
    Pure lag-window plan — one shuffle on the key, no Python.
    `change_kind` is 'new' for a key's first row, 'changed' after.

    Rows with a NULL fingerprint are excluded UP FRONT (they carry
    no comparable content identity): left in, a NULL both poisons
    its own comparison (NULL != x filters it silently) and becomes
    the next row's lag value, mislabeling that row 'new' and losing
    its unchanged-skip — the generic fingerprint_col, unlike the
    streaming twin's sha256, can be nullable."""
    df = df.filter(F.col(fingerprint_col).isNotNull())
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(fingerprint_col)).over(w)
    return (
        df.withColumn("_prev_fp", prev)
        .filter(
            F.col("_prev_fp").isNull()
            | (F.col(fingerprint_col) != F.col("_prev_fp"))
        )
        .withColumn(
            "change_kind",
            F.when(F.col("_prev_fp").isNull(), F.lit("new")).otherwise(
                F.lit("changed")
            ),
        )
        .drop("_prev_fp")
    )
