"""Deduplication operators for training-data pipelines.

Not in the reference (ferenda dedups only exact faceted rows,
documentrepository.py:2294-2305 → P6); these are the standard
web-corpus dedup family, built Spark-first:

- exact: hash-groupBy on normalized text.
- MinHash + LSH banding: shingle → per-seed min-hash → band buckets
  → candidate pairs via a bucket self-join.  Each shingle is md5'd
  ONCE into a 28-bit integer; the per-seed hashes are affine
  transforms of that base mod a Mersenne prime — integers all the
  way (narrow shuffle rows, one hash evaluation per shingle instead
  of one per (shingle, seed)), and the identical arithmetic runs in
  DuckDB for the oracle twin.
- SimHash: 32-bit signature from per-token md5 high-bits.
- n-gram Jaccard: exact set overlap via a shingle equi-join, with an
  optional document-frequency cap that drops boilerplate shingles
  before the join (the quadratic-blowup guard at corpus scale).

Scale notes (100 TB): the shingle explode is the wide step — it is a
map-only stage feeding a groupBy with partial aggregation, so it
shuffles one (doc, band, minhash) row per band, not per shingle.
The candidate self-join is on band-bucket keys whose cardinality is
controlled by (bands, rows-per-band); hot buckets (boilerplate) are
handled by AQE skew-join splitting, enabled in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    """Whitespace-collapse + lowercase (P3, documentrepository.py:2157)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: groupBy md5(normalized text); representative =
    min id. Output (content_hash, representative, n_copies)."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).cast("long").alias("representative"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc: (id, shingle).

    Normalization + tokenization stay JVM-side (codegen'd split of
    the normalized text — identical strings to the DuckDB twin); the
    sliding-window join runs in an Arrow-batched mapInPandas.  The
    pure-column alternative (transform(sequence) + slice +
    concat_ws) is measurably ~2.5× slower because Spark evaluates
    higher-order functions interpreted, element by element — see
    BENCH notes; this is the measured-faster path, not a guess.
    """
    import pandas as pd
    from pyspark.sql import types as T

    toks = F.split(normalize_text(F.col(text_col)), " ")
    src = df.select(F.col(id_col).alias("id"), toks.alias("w")).filter(
        F.size("w") >= k
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("shingle", T.StringType())]
    )

    def run(batches):
        for pdf in batches:
            ids: list = []
            out: list = []
            for i, w in zip(pdf["id"], pdf["w"]):
                seen = {" ".join(w[j : j + k]) for j in range(len(w) - k + 1)}
                out.extend(seen)
                ids.extend([i] * len(seen))
            yield pd.DataFrame({"id": ids, "shingle": out})

    return src.mapInPandas(run, schema)


#: Mersenne prime + fixed affine constants for the minhash family
#: h_i(x) = (A_i·base(x) + B_i) mod P.  base() is 28 bits and the
#: constants are < 2^31, so A·base + B < 2^59 — no 64-bit overflow
#: on either engine (Spark runs ANSI mode; overflow would throw).
MINHASH_PRIME = 2147483647
MINHASH_AB = (
    (1103515245, 12345),
    (1140671485, 12820163),
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 1),
    (214013, 2531011),
    (1220703125, 7261067),
    (69069, 1234567),
)


def shingle_base_hash(col):
    """28-bit integer base hash: first 7 hex digits of md5, parsed.
    Mirrored digit-by-digit in the DuckDB oracle (strpos arithmetic),
    so both engines derive the identical integer."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def minhash_signatures(shingles: DataFrame, n_hashes: int = 8) -> DataFrame:
    """Per (id, seed): min over shingles of the seed's affine hash.

    md5 runs ONCE per shingle (base is a projected column, so no
    reliance on expression CSE); the n_hashes variants are integer
    multiply-adds evaluated as n_hashes MIN aggregate columns over
    one groupBy("id") — the aggregation hash map sees |shingles|
    rows once instead of |shingles|×n_hashes exploded rows, and the
    shuffle carries |docs| rows of n_hashes longs.  The (id, seed,
    minhash) long format the LSH bander consumes is unpivoted AFTER
    aggregation, when only |docs| rows remain.
    Output (id, seed, minhash: long).
    """
    base_rows = shingles.select(
        "id", shingle_base_hash(F.col("shingle")).alias("base")
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("base") + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    ]
    sig_wide = base_rows.groupBy("id").agg(*aggs)
    return sig_wide.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
        ).alias("seed", "minhash"),
    ).select("id", F.col("seed").cast("int").alias("seed"), "minhash")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Band the signature (seed div rows_per_band), bucket key =
    the band's concatenated minhashes; docs sharing any bucket are
    candidates.  Self-join on (band, bucket) — the LSH trick makes
    this join's key space huge, so it stays sparse.
    Output (id_a, id_b) with id_a < id_b, distinct.

    `max_bucket_size` bounds the d² blowup of degenerate buckets
    (boilerplate/near-empty docs all hashing identically): buckets
    with more than that many members are dropped via a counted
    semi-join BEFORE the self-join, so the worst bucket emits at
    most max_bucket_size² candidate rows instead of an unbounded d².
    Same design as jaccard_pairs' document-frequency cap; a bucket
    that large carries ~no discrimination signal anyway (its
    members pair through their other, selective bands).  AQE still
    splits whatever skew remains below the cap."""
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seed", "minhash"))),
                    lambda x: x.minhash.cast("string"),
                ),
            ).alias("bucket")
        )
    )
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(small, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle:
    |A∩B| via shingle equi-join, |A∪B| = |A|+|B|-|A∩B|.
    Output (id_a, id_b, jaccard) above threshold.

    The equi-join on shingle is the scale risk: a boilerplate shingle
    with document frequency d contributes d² join rows.  When
    `max_doc_freq` is set, shingles above the cap are dropped BEFORE
    the join (one groupBy + anti-join); sizes are computed on the
    capped sets so the jaccard stays a true set statistic of the
    retained shingles.  The input is persisted — it feeds three
    consumers (sizes + both join sides) and would otherwise
    recompute the normalize/explode chain three times."""
    from pyspark.storagelevel import StorageLevel

    if max_doc_freq is not None:
        hot = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        shingles = shingles.join(hot, "shingle", "left_anti")
    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature: bit j = sign of Σ_tokens (±1 by the high
    bit of hex digit j of md5(token)). 32 hex digits → ≤32 bits.
    Output (id, simhash) where simhash is a '01...' bitstring —
    hamming distance = length of the differing positions.

    Whole plan is explode + conditional sums — no UDF; at scale the
    per-(id, j) partial aggregation combines map-side."""
    assert bits <= 32
    toks = F.explode(
        F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    ).alias("tok")
    per_tok = df.select(F.col(id_col).alias("id"), toks).select(
        "id", F.md5("tok").alias("h")
    )
    js = F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("j")
    contrib = per_tok.select("id", "h", js).select(
        "id",
        "j",
        F.when(
            F.col("h").substr(F.col("j"), F.lit(1)).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"
            ),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    return (
        contrib.groupBy("id", "j")
        .agg(F.sum("s").alias("tot"))
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", "tot"))),
                    lambda x: F.when(x.tot >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
            ).alias("simhash")
        )
    )


def fuzzy_dedup_clusters(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """End-to-end fuzzy dedup, the full chain a training-data
    pipeline actually runs before dropping duplicates:

        shingle → MinHash → LSH candidates → exact-Jaccard verify
        → connected components → per-doc cluster assignment

    (MinHash-LSH clustering as in Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — candidates from
    band collisions, verified edges, transitively closed.)

    Verification is PER-CANDIDATE, not all-pairs: each doc's
    distinct shingle set is collected into one array row (bounded by
    doc length, not corpus size) and candidate pairs join these sets
    back for `array_intersect` — shuffle volume is O(|candidates| ×
    doc-shingles), never the all-pairs shingle join.  Components are
    closed with the size-aware CC used for owl:sameAs
    canonicalization (ids zero-padded so the string-min root IS the
    numeric-min member).  Every document appears in the output;
    docs with no verified edge (including docs shorter than k
    tokens) are their own singleton cluster.

    Output (id, cluster_rep, cluster_size, is_dup) — is_dup marks
    every non-representative member, i.e. the rows a keep-one-
    per-cluster policy would drop.
    """
    from pyspark.storagelevel import StorageLevel

    from ferenda_spark.operators.canonicalize import connected_components

    # the shingle table feeds BOTH the signature path and the
    # exact-verify sets; persist so tokenization runs once
    sh = word_shingles(docs, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures(sh, n_hashes)
    cand = lsh_candidate_pairs(
        sig, bands, rows_per_band, max_bucket_size=max_bucket_size
    )
    sets_ = sh.groupBy("id").agg(F.collect_set("shingle").alias("ss"))
    verified = (
        cand.join(
            sets_.select(F.col("id").alias("id_a"), F.col("ss").alias("sa")), "id_a"
        )
        .join(sets_.select(F.col("id").alias("id_b"), F.col("ss").alias("sb")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")).cast("double"))
        .withColumn(
            "jac",
            F.col("inter")
            / (F.size("sa") + F.size("sb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b")
    )
    pad = lambda c: F.lpad(F.col(c).cast("string"), 20, "0")  # noqa: E731
    canon = connected_components(
        verified.select(pad("id_a").alias("src"), pad("id_b").alias("dst"))
    )
    rep_map = canon.select(
        F.col("uri").cast("long").alias("id"),
        F.col("canon_uri").cast("long").alias("rep"),
    )
    ids = docs.select(F.col(id_col).cast("long").alias("id")).distinct()
    assigned = ids.join(rep_map, "id", "left").select(
        "id", F.coalesce("rep", F.col("id")).alias("cluster_rep")
    )
    sizes = assigned.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_rep").select(
        "id",
        "cluster_rep",
        "cluster_size",
        (F.col("id") != F.col("cluster_rep")).alias("is_dup"),
    )


def positional_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Every k-word span per doc, one row PER POSITION (duplicates
    kept — unlike word_shingles' distinct sets): (id, pos, gram),
    pos = 0-based token index the span starts at.  Same JVM-side
    normalize/tokenize + Arrow-batched sliding window as
    word_shingles; the positional multiset is what span-duplication
    *rates* and *removal* need, since a doc repeating a duplicated
    span 10 times is 10 positions of duplicated text, not 1."""
    import pandas as pd
    from pyspark.sql import types as T

    toks = F.split(normalize_text(F.col(text_col)), " ")
    src = df.select(F.col(id_col).alias("id"), toks.alias("w")).filter(
        F.size("w") >= k
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("gram", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids: list = []
            poss: list = []
            out: list = []
            for i, w in zip(pdf["id"], pdf["w"]):
                n = len(w) - k + 1
                out.extend(" ".join(w[j : j + k]) for j in range(n))
                poss.extend(range(n))
                ids.extend([i] * n)
            yield pd.DataFrame({"id": ids, "pos": poss, "gram": out})

    return src.mapInPandas(run, schema)


def duplicate_span_stats(
    docs: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Cross-document duplicate-span rate per doc: the fraction of a
    doc's k-token span positions whose text also occurs in at least
    one OTHER document (the corpus-level duplicate-text signal of
    exact-substring dedup — Lee et al., "Deduplicating Training Data
    Makes Language Models Better" — restated as k-gram document
    frequency; RefinedWeb/Gopher-style pipelines filter on exactly
    this rate).  Complements repetition_signals, which is
    WITHIN-doc: a doc can be internally clean yet 90% boilerplate
    shared with its template siblings — this operator is what
    catches that.

    'Occurs in another document' is decided WITHOUT counting
    distinct docs per gram: min(id) != max(id) over the gram's
    positions — two MIN/MAX aggregates that partial-aggregate
    map-side, where countDistinct would shuffle every (gram, id)
    pair.  Hot boilerplate grams therefore cost one aggregate row
    each, and the only per-position shuffle is the semi-join back to
    spans on the gram key (AQE splits whatever skew it has).  Every
    document appears in the output; docs shorter than k tokens have
    n_spans = 0 and rate 0.

    Output (id, n_spans, n_dup_spans, dup_frac_r6).
    """
    from pyspark.storagelevel import StorageLevel

    sp = positional_spans(docs, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup_grams = (
        sp.groupBy("gram")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gram")
    )
    totals = sp.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    dups = (
        sp.join(dup_grams, "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"))
    )
    ids = docs.select(F.col(id_col).cast("long").alias("id")).distinct()
    scale = 10.0**6
    return (
        ids.join(totals, "id", "left")
        .join(dups, "id", "left")
        .select(
            "id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            # fixed IEEE op order (nd·10⁶ / n, then half-up floor) —
            # identical sequence in the DuckDB twin, so both engines
            # produce the same bits (see query.round_portable)
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.floor(
                    F.coalesce("n_dup_spans", F.lit(0)) * scale / F.col("n_spans")
                    + 0.5
                )
                / scale,
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac_r6"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """The REMOVAL step that pairs with duplicate_span_stats: cut
    every token covered by a cross-document duplicated k-gram from
    every document (the exact-substring dedup cut of Lee et al.,
    applied symmetrically — all occurrences go, which keeps the
    operator deterministic with no arbitrary keeper choice; a
    keep-one policy is a dedup_clusters-style representative pick
    layered on top if ever needed).  Output text is the normalized
    token stream re-joined with single spaces — the same normalized
    space every dedup operator here compares in.

    Plan (all JVM column expressions after the shared Arrow span
    window): duplicated grams via the same MIN/MAX-id partial
    aggregates as duplicate_span_stats (no countDistinct), covered
    token indices via sequence+explode of the duplicated span
    positions (distinct per (id, idx)), kept tokens via a LEFT ANTI
    join on (id, idx), and per-doc reassembly as one
    array_sort(collect_list(struct(idx, tok))) aggregation —
    partial-aggregated, bounded by doc length per group.

    Output (id, clean_text, n_tokens, n_tokens_removed) for EVERY
    document; docs shorter than k tokens pass through unchanged.
    """
    from pyspark.storagelevel import StorageLevel

    sp = positional_spans(docs, text_col, id_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup_grams = (
        sp.groupBy("gram")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gram")
    )
    covered = (
        sp.join(dup_grams, "gram", "left_semi")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "idx", "tok"
        ),
    )
    kept = toks.join(covered, ["id", "idx"], "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("idx", "tok"))),
                lambda x: x.tok,
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    ids = docs.select(F.col(id_col).cast("long").alias("id")).distinct()
    return (
        ids.join(totals, "id", "left")
        .join(reassembled, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )
