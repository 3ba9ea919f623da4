"""Deduplication operators for training-data pipelines.

Not in the reference (ferenda dedups only exact faceted rows,
documentrepository.py:2294-2305 → P6); these are the standard
web-corpus dedup family, built Spark-first:

- exact: hash-groupBy on normalized text.
- MinHash + LSH banding: shingle → per-seed min-hash → band buckets
  → candidate pairs via a bucket self-join.  All hashing is md5-hex
  (deterministic, identical in DuckDB for the oracle checks); at
  production scale swap the hex strings for xxhash64 ints — same
  plan shape, ~4× less shuffle width.
- SimHash: 32-bit signature from per-token md5 high-bits.
- n-gram Jaccard: exact set overlap via a shingle equi-join.

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

    Built-in array ops only (split → transform(sequence) →
    explode) — stays inside whole-stage codegen, no Python.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return (
        df.filter(F.size(toks) >= k)
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = 8) -> DataFrame:
    """Per (id, seed): lexicographic-min md5('seed:'||shingle).

    One explode by n_hashes then a partially-aggregated groupBy —
    shuffle rows = |docs| × n_hashes, independent of shingle count.
    Output (id, seed, minhash).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        shingles.select("id", "shingle", seeds)
        .select(
            "id",
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), "shingle")).alias("h"),
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature (seed div rows_per_band), bucket key =
    md5 of the band's concatenated minhashes; docs sharing any
    bucket are candidates.  Self-join on (band, bucket) — the LSH
    trick makes this join's key space huge, so it stays sparse.
    Output (id_a, id_b) with id_a < id_b, distinct."""
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list(F.struct("seed", "minhash"))).minhash)).alias("bucket"))
    )
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


def jaccard_pairs(shingles: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle:
    |A∩B| via shingle equi-join, |A∪B| = |A|+|B|-|A∩B|.
    Output (id_a, id_b, jaccard) above threshold.

    The equi-join on shingle is the scale risk: boilerplate shingles
    are hot keys. Production guard: drop shingles with document
    frequency above a cap before joining (they only ever connect
    near-everything); here the synthetic vocabulary is small enough
    to skip the cap."""
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
