"""Corpus-curation operators for training-data pipelines: intra-doc
repetition signals, deterministic host-stratified splits, per-host
(domain) aggregates, benchmark-contamination detection, and PII
scanning.

These generalize ferenda's per-document hygiene passes (whitespace
normalize documentrepository.py:2157, word counting :2157-2167, the
distill/validate gates) to the corpus-level curation steps a
large-scale LLM training-data pipeline runs (public literature:
Gopher/C4 repetition filters, test-set decontamination by n-gram
overlap, domain-level mixing, PII redaction).

Scale notes (100 TB):
- repetition_signals is one narrow projection (array expressions +
  one F.aggregate fold over the sorted token array) — zero shuffle,
  all JVM-side (the higher-order functions are interpreted, not
  codegen'd, but never cross into Python), embarrassingly parallel.
- host_split is a pure projection (md5-prefix bucketing) — zero
  shuffle; every document of a host lands in the same split, so
  near-duplicate pages within a site can never straddle train/test.
- host_aggregates is one partial-aggregated groupBy(host); host
  cardinality ≪ doc cardinality, so the shuffle is tiny.
- contamination joins the corpus shingle explode against a DISTINCT
  benchmark-shingle set; benchmark suites are small by nature
  (≤ ~10^6 n-grams), so the join side is broadcast — the corpus side
  never shuffles.  Past broadcast size, drop the F.broadcast hint
  and let AQE pick (documented ceiling).
- pii_scan is regexp column expressions — zero shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.dedup import normalize_text, word_shingles
from ferenda_spark.operators.query import round_portable


def _dup_frac(toks, k: int):
    """Fraction of word k-grams occurring more than once — the
    Gopher duplicate-n-gram-fraction repetition signal.  0.0 when
    the doc has < k tokens (no k-grams)."""
    n = F.size(toks) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    frac = (n - F.size(F.array_distinct(grams))).cast("double") / n
    return F.when(n <= 0, F.lit(0.0)).otherwise(round_portable(frac, 6))


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition features (Gopher-style quality rules):
    (id, n_tokens, top_word_frac, dup_2gram_frac, dup_3gram_frac).

    top_word_frac = occurrences of the most frequent token / tokens,
    computed as the longest equal-run in the SORTED token array via
    one F.aggregate fold (struct state: prev token, current run,
    best run) — no explode, no groupBy, no shuffle; the whole
    operator is a single JVM-side projection."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("w"))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(F.array_sort(F.col("w")), zero, step, lambda acc: acc["best"])
    n = F.size(F.col("w"))
    return base.select(
        "id",
        n.cast("long").alias("n_tokens"),
        round_portable(top.cast("double") / n, 6).alias("top_word_frac"),
        _dup_frac(F.col("w"), 2).alias("dup_2gram_frac"),
        _dup_frac(F.col("w"), 3).alias("dup_3gram_frac"),
    )


#: Split thresholds in 256ths of the md5-prefix space: a document's
#: host hashes to its first md5 byte (2 lowercase hex chars —
#: lexicographic order on fixed-width lowercase hex IS numeric
#: order, in any engine); train < 230/256 (~90%), val < 243/256
#: (~95%), else test.
SPLIT_TRAIN_HEX = "e6"
SPLIT_VAL_HEX = "f3"


def host_split(
    df: DataFrame,
    host_col: str,
    id_col: str,
    train_hex: str = SPLIT_TRAIN_HEX,
    val_hex: str = SPLIT_VAL_HEX,
) -> DataFrame:
    """Deterministic host-stratified train/val/test split:
    (id, host, split).  ALL documents of a host share a split —
    intra-site near-duplicates can never leak across splits (the
    published decontamination practice).  Pure projection: no
    shuffle, no RNG, reproducible across engines and runs."""
    b = F.substring(F.md5(F.col(host_col)), 1, 2)
    split = (
        F.when(b < F.lit(train_hex), F.lit("train"))
        .when(b < F.lit(val_hex), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col).alias("id"), F.col(host_col).alias("host"), split.alias("split")
    )


def host_aggregates(
    df: DataFrame,
    host_col: str,
    text_col: str,
    lang_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Domain-level corpus statistics for mixing/filtering decisions:
    per host (host, n_docs, total_tokens, mean_doc_tokens, n_langs,
    keep).  `keep` demonstrates the domain filter rule (drop hosts
    with < min_docs documents — tiny hosts are disproportionately
    spam in web corpora).  One partial-aggregated groupBy; host
    cardinality ≪ rows, so the shuffle is small."""
    n_tok = F.size(F.split(normalize_text(F.col(text_col)), " "))
    return (
        df.select(F.col(host_col).alias("host"), n_tok.alias("nt"), F.col(lang_col))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
            round_portable(F.sum("nt").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_doc_tokens"
            ),
            F.countDistinct(lang_col).cast("long").alias("n_langs"),
        )
        .withColumn("keep", F.col("n_docs") >= F.lit(min_docs))
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Test-set decontamination by k-gram overlap (the published
    GPT-3/PaLM practice: flag training documents sharing any long
    n-gram with an evaluation benchmark).  Output one row per
    contaminated corpus document: (id, n_hits) = number of DISTINCT
    benchmark k-grams the document contains.

    Plan: corpus shingle explode (the unavoidable wide projection)
    ⋈ DISTINCT benchmark shingles.  Benchmark suites are small
    (≤ ~10^6 k-grams), so the benchmark side is broadcast and the
    corpus side NEVER shuffles; the groupBy(id) after the join is
    partial-aggregated.  Set broadcast_benchmark=False past the
    broadcast ceiling (AQE then picks the strategy)."""
    bench_sh = word_shingles(benchmark, text_col, id_col, k=k).select(
        F.col("shingle").alias("_bs")
    ).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    corpus_sh = word_shingles(corpus, text_col, id_col, k=k)
    return (
        corpus_sh.join(bench_sh, corpus_sh["shingle"] == F.col("_bs"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


#: PII patterns — deliberately restricted to regex constructs with
#: identical semantics in Java regex (Spark) and RE2 (DuckDB/
#: deployment scanners): character classes, bounded repetition,
#: alternation; no backrefs or lookaround.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PII_PHONE = r"\+[0-9][0-9 ()-]{6,}[0-9]"
PII_DIGITS = r"[0-9][0-9]+"


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII detection + redaction fingerprint:
    (id, n_emails, n_phones, n_digit_seqs, redacted_md5).
    redacted_md5 = md5 of the text after replacing every email/
    phone match with '<PII>' (emails first — a phone-like substring
    inside an email must not double-fire).  n_phones is counted on
    the EMAIL-REDACTED text for the same reason: '+123456789@x.com'
    is one email, not an email plus a phone.  Counts are
    regexp_extract_all sizes; everything is codegen'd column
    expressions — zero shuffle, no Python."""
    t = F.lower(F.col(text_col))
    email_red = F.regexp_replace(t, PII_EMAIL, "<PII>")
    redacted = F.regexp_replace(email_red, PII_PHONE, "<PII>")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(email_red, F.lit(PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(PII_DIGITS), 0))
        .cast("long")
        .alias("n_digit_seqs"),
        F.md5(redacted).alias("redacted_md5"),
    )


#: Query parameters that identify a click, not a resource — the
#: standard strip-list for crawl dedup keying (utm_* per Google's
#: Urchin params; gclid/fbclid ad-click ids; plain `ref`errer tags).
URL_TRACKING_PARAMS = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_URL_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY = r"^[^?#]*\?([^#]*)"


def normalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """URL canonicalization for crawl dedup keying — the reason two
    captures of one resource look distinct: (.. all input columns ..,
    canon_url, url_host).

    Rules (the conservative, loss-free subset every crawl pipeline
    agrees on):
      - scheme and host lowercased; default ports dropped
        (http:80, https:443); non-default ports kept;
      - fragment dropped (never sent to the server);
      - tracking query params dropped (URL_TRACKING_PARAMS:
        utm_*, gclid, fbclid, ref), remaining params sorted
        byte-wise so param order does not split dedup groups;
      - empty path becomes '/'.

    Pure column projection — regexp extracts + an array
    filter/sort, zero shuffle, codegen'd end to end; at 10^12 pages
    this adds no exchange to whatever consumes it (exact_dedup on
    canon_url, host_split on url_host)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME, 1))
    hostport = F.lower(F.regexp_extract(u, _URL_HOSTPORT, 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(u, _URL_PATH, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(u, _URL_QUERY, 1), "&"),
        lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAMS),
    )
    query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # a row that is not a scheme://host url at all keeps its raw
    # string as the canon key (still dedups exact copies)
    canon = F.when(scheme == "", u).otherwise(canon)
    return df.withColumn("canon_url", canon).withColumn("url_host", host)


#: Java-regex class matching any non-ASCII character — the gate for
#: the Unicode-normalization slow path
_NON_ASCII = "[^\\u0000-\\u007F]"


def _stable_for_split(df: DataFrame, assume_deterministic: bool) -> DataFrame:
    """The filter/union split scans its input twice; on a
    NON-deterministic unpersisted upstream (e.g. sampling without a
    seed, rand() columns) the two branches could disagree — dropping
    or duplicating rows.  Callers with such an upstream pass
    assume_deterministic=False and we pin the input with a persist
    (storage-level check first: an already-persisted input is left
    alone).  The default stays zero-cost because deterministic
    lineage — every reference pipeline stage here — needs no pin."""
    if assume_deterministic:
        return df
    sl = df.storageLevel
    if sl.useMemory or sl.useDisk:
        return df
    return df.persist()


def normalize_unicode(
    df: DataFrame, text_col: str, form: str = "NFC",
    assume_deterministic: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column (default NFC — the form web
    text should be in before hashing/dedup/tokenization; decomposed
    sequences otherwise defeat exact dedup and fingerprinting of
    visually-identical strings).

    Scale design: normalization itself needs ICU-class tables, so it
    runs as an Arrow-batched pandas UDF (pandas' vectorized
    Series.str.normalize) — but ONLY for rows that contain a
    non-ASCII character.  The gate is a FILTER/UNION SPLIT, not a
    CASE WHEN around the UDF: Catalyst extracts Python UDFs out of
    conditionals into an ArrowEvalPython node that runs over EVERY
    input row (measured — the when() only picks which precomputed
    value to keep), so the conditional form ships the whole corpus
    through Arrow anyway.  Split, the clean branch (the overwhelming
    majority of a web corpus; ASCII is NFC by construction) never
    leaves the JVM and only the non-ASCII branch pays the Python
    round-trip.  Zero shuffle either way (two filters + union over
    one scan); persist upstream first if it is expensive to
    recompute, as with any multi-consumer plan.  If the upstream is
    NON-deterministic (unseeded sample, rand()), pass
    assume_deterministic=False — the double scan is then pinned with
    a persist so both branches see the same rows."""
    from pyspark.sql.functions import pandas_udf

    df = _stable_for_split(df, assume_deterministic)

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    t = F.col(text_col)
    needs = t.isNotNull() & t.rlike(_NON_ASCII)
    clean = df.filter(t.isNull() | ~t.rlike(_NON_ASCII))
    dirty = df.filter(needs).withColumn(text_col, _norm(t))
    return clean.unionByName(dirty)


#: UTF-8-read-as-latin1 leaves a lead byte (U+00C2..U+00F4 as a
#: latin1 char) followed by a continuation byte (U+0080..U+00BF) —
#: a pair essentially absent from clean text in any language.  Pure
#: Catalyst gate for the repair slow path.
_MOJIBAKE_MARK = "[\\u00C2-\\u00F4][\\u0080-\\u00BF]"


def fix_mojibake(
    df: DataFrame, text_col: str, max_passes: int = 3,
    assume_deterministic: bool = True,
) -> DataFrame:
    """Repair UTF-8-decoded-as-Latin-1 mojibake ('cafÃ©' -> 'café'),
    the single most common web-crawl encoding defect (the ftfy
    heuristic): re-encode the text as Latin-1 and, iff the bytes
    form valid UTF-8, decode them as UTF-8; otherwise leave the row
    untouched.  Applied to fixpoint (≤ max_passes) so doubly-mangled
    text also recovers.

    Scale design mirrors normalize_unicode: the repair runs as an
    Arrow-batched pandas UDF, but only for rows matching the
    mojibake indicator pair (a pure-Catalyst rlike) — the gate is a
    filter/union split (see normalize_unicode: a CASE WHEN around a
    Python UDF still evaluates it for every row), so clean ASCII
    and clean non-ASCII text never leave the JVM.  Zero shuffle.
    Non-deterministic upstream: pass assume_deterministic=False
    (see _stable_for_split)."""
    from pyspark.sql.functions import pandas_udf

    df = _stable_for_split(df, assume_deterministic)

    def _fix_one(x):
        for _ in range(max_passes):
            if x is None:
                return x
            try:
                b = x.encode("iso-8859-1")
            except UnicodeEncodeError:
                return x
            try:
                y = b.decode("utf-8")
            except UnicodeDecodeError:
                return x
            if y == x:
                return x
            x = y
        return x

    @pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(_fix_one)

    t = F.col(text_col)
    needs = t.isNotNull() & t.rlike(_MOJIBAKE_MARK)
    clean = df.filter(t.isNull() | ~t.rlike(_MOJIBAKE_MARK))
    dirty = df.filter(needs).withColumn(text_col, _fix(t))
    return clean.unionByName(dirty)


def clean_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 3,
    blacklist: tuple[str, ...] = ("javascript", "cookie", "©"),
) -> DataFrame:
    """C4-style line-wise cleaning (Raffel et al. §2.2; same family
    as RefinedWeb's line-level rules): keep only lines that

    - end in terminal punctuation ('.', '!', '?'),
    - have at least `min_words` whitespace-separated words, and
    - contain no blacklisted substring (case-insensitive) — the
      boilerplate markers (javascript notices, cookie banners,
      copyright lines) C4 drops.

    Output (id, clean_text, n_lines, n_lines_removed) for EVERY row;
    clean_text re-joins the kept lines with '\\n' in original order.

    Plan shape: posexplode(split) → codegen'd filters → one
    partial-aggregated groupBy(id) reassembling via
    sort_array(collect_list(struct(pos, line))) — the same bounded
    per-doc aggregation as dedup.remove_duplicate_spans; no Python,
    no window, shuffle keyed on id only."""
    # id kept AS-IS: a cast("long") here would turn string ids
    # (urls — what half this module's operators key on) into NULL
    # and silently merge every document into one id=NULL group
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).withColumn("line", F.trim(F.col("raw")))
    keep = (
        F.col("line").rlike(r"[.!?]$")
        & (F.size(F.split(F.col("line"), r"\s+")) >= min_words)
    )
    low = F.lower(F.col("line"))
    for b in blacklist:
        keep = keep & ~F.contains(low, F.lit(b))
    kept = lines.filter(keep)
    reassembled = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda x: x.line,
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(totals, "id", "left")
        .join(reassembled, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


def sequence_pack_plan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    shard_size: int = 100_000,
) -> DataFrame:
    """Concat-then-chunk sequence packing plan — the GPT-style
    pretraining batch layout: documents concatenate in id order and
    the token stream chunks into fixed `seq_len` windows; each doc's
    row says where its text lands (global token offset, sequence
    index, offset inside that sequence).  Token = whitespace token
    of the normalized text, identical to textstats.token_count's
    n_ws_tokens.

    The global running sum is NOT a global no-partition window (the
    single-reducer anti-pattern this repo's paginate/search work
    eliminated): ids are RANGE-sharded on the order key
    (shard = id div shard_size), per-shard token totals partial-
    aggregate into one row per shard, the shard-prefix cumsum runs
    over that tiny table (|shards| = |docs|/shard_size rows — at
    10^12 docs and 10M-doc shards, 10^5 rows), and the broadcast
    prefix joins back so the within-shard cumsum window is
    PARTITIONED BY shard.  The standard two-phase distributed prefix
    sum: shuffle = one |shards|-row agg + one shard-partitioned
    window, never a global sort.

    Output (id, n_tokens, global_start, seq_id, seq_offset).
    """
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col).cast("long").alias("id"),
        # NULL text = zero tokens (size(split(NULL)) is NULL)
        F.coalesce(
            F.size(F.split(normalize_text(F.col(text_col)), " ")), F.lit(0)
        )
        .cast("long")
        .alias("n_tokens"),
    ).withColumn("shard", F.floor(F.col("id") / shard_size))
    shard_tot = t.groupBy("shard").agg(F.sum("n_tokens").alias("tot"))
    w_prefix = (
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = shard_tot.select(
        "shard",
        F.coalesce(F.sum("tot").over(w_prefix), F.lit(0)).alias("before"),
    )
    w_intra = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        t.join(F.broadcast(prefix), "shard")
        .withColumn(
            "global_start",
            F.col("before")
            + F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0)),
        )
        .select(
            "id",
            "n_tokens",
            F.col("global_start").cast("long").alias("global_start"),
            F.floor(F.col("global_start") / seq_len)
            .cast("long")
            .alias("seq_id"),
            (F.col("global_start") % seq_len).cast("long").alias("seq_offset"),
        )
    )
    return out


def weighted_sample(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-domain weighted downsampling — the mixture-
    building step (domain reweighting a la The Pile / DoReMi-style
    fixed mixtures): keep a row iff its reproducible uniform draw
    u(key, id) falls below the domain's rate.  No RNG state: u is
    the first 12 md5 hex chars of 'key:id' over 16^12 — a 48-bit
    integer, exactly representable in a double, divided by a power
    of two, so EVERY engine computes the identical u and the sample
    is reproducible row-for-row across runs, engines, and cluster
    sizes (the property rand() sampling cannot give).

    `rates` is config-sized (one entry per domain override) and
    compiles to a chained CASE — pure projection, zero shuffle.
    Output kept rows only: (id, key, u).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    # NULL key/id must still draw (concat of any
                    # NULL is NULL -> u NULL -> row silently dropped
                    # even at default_rate=1.0); '' is the NULL
                    # bucket's stable stand-in
                    F.concat(
                        F.coalesce(F.col(key_col), F.lit("")),
                        F.lit(":"),
                        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(16**12))
    )
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(key_col) == key, F.lit(float(r))).otherwise(rate)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(key_col).alias("key"),
            u.alias("u"),
            rate.alias("_rate"),
        )
        .filter(F.col("u") < F.col("_rate"))
        .select("id", "key", "u")
    )
