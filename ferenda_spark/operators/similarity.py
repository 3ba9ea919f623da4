"""Similarity search over embedding columns (array<float>).

Not in the reference (ferenda's nearest "similarity" is the difflib
gazetteer fallback, documentrepository.py:560-575); this is the
standard ANN family a training-data pipeline needs:

- brute-force cosine top-k: exact baseline — broadcast the probe
  matrix, score each corpus Arrow batch with one BLAS matmul in
  mapInPandas (vectorized, never per-row Python), window top-k.
- LSH-bucketed variant (random hyperplanes): the scale path — each
  vector maps to a sign-pattern bucket; candidates share a bucket in
  at least one of `tables` independent hash tables.  Probes only
  |bucket| candidates instead of |corpus|; recall is tested against
  the brute-force baseline (tests/test_training_ops.py).

Scale notes (100 TB): brute force is O(|Q|×|C|) — fine when |Q| is
a broadcast-sized probe set; the LSH variant shuffles once on bucket
key and joins bucket-local, so corpus size only enters through
bucket occupancy.  Hyperplanes are derived deterministically from
md5(seed) so executors regenerate them without a broadcast of
floats.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array<double> columns, JVM-side.

    Zero-norm vectors have no defined cosine: try_divide yields NULL
    (the row drops from >= threshold filters) instead of the ANSI
    DIVIDE_BY_ZERO error — without this, ONE all-zeros embedding
    anywhere in a 10^12-row corpus kills the whole query."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _as_double(col):
    return col.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k, Arrow-vectorized: the (small) probe set is
    collected to a numpy matrix and broadcast; each corpus Arrow
    batch is scored against all probes with one BLAS matmul inside
    mapInPandas, emitting per-batch per-query top-k candidates; a
    final window picks the global top-k.  Shuffle volume is
    O(batches × |Q| × k), never |Q| × |corpus|.

    Output (query_id, rank, neighbor_id): ids only — float scores
    are engine-rounding-sensitive and don't belong in a correctness
    contract; ordering ties broken by neighbor id."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    ).collect()
    if not qrows:
        # an empty probe set has an empty answer, not an np.stack
        # error on the driver
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long"
        )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qnorm = np.linalg.norm(qmat, axis=1)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat, qnorm))

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score(batches):
        ids_q, mat_q, nrm_q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cid = pdf["id"].to_numpy(dtype=np.int64)
            cmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = (cmat @ mat_q.T) / (
                    np.linalg.norm(cmat, axis=1)[:, None] * nrm_q[None, :]
                )
            outq, outn, outs = [], [], []
            for j in range(len(ids_q)):
                col = sims[:, j]
                # drop undefined cosines (zero-norm vectors -> NaN):
                # Spark's desc ordering ranks NaN above every real
                # score, so one zero embedding would win rank 1
                mask = (cid != ids_q[j]) & np.isfinite(col)
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # per-batch top-k superset of the global top-k
                # (lexsort: primary -sim desc, secondary id asc)
                top = cand_idx[np.lexsort((cid[cand_idx], -col[cand_idx]))[:k]]
                outq.extend([ids_q[j]] * len(top))
                outn.extend(cid[top].tolist())
                outs.extend(col[top].tolist())
            yield pd.DataFrame({"query_id": outq, "neighbor_id": outn, "sim": outs})

    c = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    scored = c.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 —
    reproducible on any executor with no RNG state."""
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            vec.append((u / 2**64) * 2.0 - 1.0)  # uniform [-1, 1)
        planes.append(vec)
    return planes


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket string for one hash table, as a pure
    column expression.  NOTE: Spark evaluates the higher-order
    aggregate folds interpreted, so the BLAS variant
    (`blas_bucket_ids`) is the hot-path implementation — this stays
    for expression-only contexts and as the semantic spec."""
    bits = [
        F.when(_dot(_as_double(vec_col), F.array(*[F.lit(x) for x in plane])) >= 0, "1")
        .otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def blas_bucket_ids(
    df: DataFrame,
    out_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All `tables` sign-pattern buckets per vector in ONE BLAS
    matmul per Arrow batch, emitting ONLY (out_id, bucket) rows —
    the vector itself is never duplicated through the ×tables
    explode.  Bucket = 't:<code>' where code packs the sign bits."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    tbls = [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(tables)]
    planes = np.asarray(tbls, dtype=np.float64)  # (tables, n_planes, dim)
    pow2 = 1 << np.arange(n_planes - 1, -1, -1)
    schema = T.StructType(
        [T.StructField(out_id, T.LongType()), T.StructField("bucket", T.StringType())]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            bits = np.einsum("bd,tpd->btp", mat, planes) >= 0
            codes = (bits * pow2).sum(axis=2)  # (batch, tables) ints
            ids = np.repeat(pdf["id"].to_numpy(dtype=np.int64), tables)
            tidx = np.tile(np.arange(tables), len(pdf))
            bucket = np.char.add(
                np.char.add(tidx.astype("U2"), ":"),
                codes.ravel().astype(f"U{n_planes + 1}"),
            )
            yield pd.DataFrame({out_id: ids, "bucket": bucket})

    src = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    return src.mapInPandas(run, schema=schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 3,
    tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing the
    query's bucket in ≥1 of `tables` hash tables; exact cosine
    re-rank inside the candidate set.  Same output contract as
    brute_force_topk (ranks may differ — that's the approximation;
    recall is asserted in tests, not here).

    Defaults (12 tables × 3 planes) are tuned for the test corpora
    (~10³-10⁵ 64-dim vectors): measured recall@5 ≥ 0.9 across seeds,
    with 2³ buckets/table giving ~n/8-sized candidate lists.  At
    larger corpus sizes raise `n_planes` ≈ log2(n / target_bucket)
    so per-table bucket size — and with it candidate-join fan-out —
    stays bounded; recall lost to narrower buckets is bought back
    with more `tables` (union of independent probes).

    Plan shape: bucket assignment computes all tables' sign patterns
    in ONE BLAS matmul per Arrow batch (numpy-vectorized, no per-row
    Python), emitting ONLY (id, bucket) rows — vectors are never
    duplicated through the ×tables explode; the candidate id pairs,
    deduped while still narrow, join the vectors back for the exact
    re-rank (probe side broadcast)."""
    cand = (
        blas_bucket_ids(queries, "query_id", id_col, vec_col, dim, n_planes, tables, seed)
        .join(
            blas_bucket_ids(
                corpus, "neighbor_id", id_col, vec_col, dim, n_planes, tables, seed
            ),
            "bucket",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    # Size-aware broadcast (same pattern as rewrite_triples): the
    # API allows queries == corpus, where an unconditional broadcast
    # of the query-vector table would OOM the driver/executors.  The
    # count is a cheap narrow scan of the (usually tiny) probe set.
    q_count = queries.count()
    scored = (
        cand.join(F.broadcast(qv) if q_count <= 100_000 else qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def threshold_pairs_exact(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TEST-ONLY exact baseline: collects the full (id, vec) matrix
    to the driver and broadcasts it; each Arrow batch scores against
    it with one BLAS matmul.  The driver collect bounds this to
    corpora whose matrix fits driver memory — the production paths
    are `threshold_pairs_blocked` (exact, no collect) and
    `neardup_pairs` (LSH prefilter); the catalog uses the former."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    rows = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    nrm = np.linalg.norm(mat, axis=1)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat, nrm))

    schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def score(batches):
        all_ids, all_mat, all_nrm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cid = pdf["id"].to_numpy(dtype=np.int64)
            cmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = (cmat @ all_mat.T) / (
                    np.linalg.norm(cmat, axis=1)[:, None] * all_nrm[None, :]
                )
            bi, bj = np.nonzero((sims >= threshold) & (cid[:, None] < all_ids[None, :]))
            yield pd.DataFrame({"id_a": cid[bi], "id_b": all_ids[bj]})

    src = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    return src.mapInPandas(score, schema=schema)


def threshold_pairs_blocked(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold with NO driver collect:
    distributed block-matrix self-join.  Vectors hash into n_blocks
    blocks; every unordered block pair (i ≤ j) is one applyInPandas
    group receiving both blocks' vectors and scoring them with one
    BLAS matmul.  One shuffle replicates each vector n_blocks times;
    per-task memory is O(2N/n_blocks · d) doubles — pick n_blocks so
    a block pair fits an executor, independent of total corpus size.
    FLOPs stay the inherent O(N²·d) of the exact semantics, spread
    over n_blocks(n_blocks+1)/2 tasks.  Output (id_a, id_b) with
    id_a < id_b, each pair exactly once (its two blocks meet in
    exactly one group)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    pair_structs = F.array(
        *[
            F.struct(
                F.least(F.col("blk"), F.lit(kk)).alias("i"),
                F.greatest(F.col("blk"), F.lit(kk)).alias("j"),
            )
            for kk in range(n_blocks)
        ]
    )
    exploded = (
        embeddings.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("v"),
            blk.alias("blk"),
        )
        .select("id", "v", "blk", F.explode(pair_structs).alias("p"))
        .select("id", "v", "blk", F.col("p.i").alias("i"), F.col("p.j").alias("j"))
    )

    schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def score(key, pdf):
        i, j = key
        a = pdf[pdf["blk"] == i]
        aids = a["id"].to_numpy(dtype=np.int64)
        if not len(aids):
            return pd.DataFrame({"id_a": [], "id_b": []})
        amat = np.stack([np.asarray(v, dtype=np.float64) for v in a["v"]])
        anrm = np.linalg.norm(amat, axis=1)
        if i == j:
            bids, bmat, bnrm = aids, amat, anrm
        else:
            b = pdf[pdf["blk"] == j]
            bids = b["id"].to_numpy(dtype=np.int64)
            if not len(bids):
                return pd.DataFrame({"id_a": [], "id_b": []})
            bmat = np.stack([np.asarray(v, dtype=np.float64) for v in b["v"]])
            bnrm = np.linalg.norm(bmat, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (amat @ bmat.T) / (anrm[:, None] * bnrm[None, :])
        hit = sims >= threshold
        if i == j:
            ai, bj = np.nonzero(hit & (aids[:, None] < bids[None, :]))
            lo, hi = aids[ai], bids[bj]
        else:
            # cross-block: each unordered pair appears once; orient by id
            ai, bj = np.nonzero(hit)
            x, y = aids[ai], bids[bj]
            lo, hi = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    return exploded.groupBy("i", "j").applyInPandas(score, schema)


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation + exact threshold filter.  Output (id_a, id_b) with
    id_a < id_b.

    Buckets come from the BLAS bucketer — (id, bucket) rows only, so
    the ×tables explode never duplicates vectors; the deduped narrow
    candidate pairs join the vectors back for the exact re-rank."""
    b = blas_bucket_ids(
        embeddings, "id", id_col, vec_col, dim, n_planes, tables, seed=42
    )
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )


def _kmeans_spherical(smat, n_centroids: int, iters: int, seed: int):
    """Spherical k-means on a driver-resident sample (cosine metric:
    rows are L2-normalized, assignment is argmax dot, the mean
    re-normalizes).  kmeans++-style farthest-first seeding from a
    seeded RNG; an emptied cluster reseeds to the point worst-served
    by the others.  O(sample × k × iters) driver work — bounded by
    construction, never cluster-sized."""
    import numpy as np

    rng = np.random.RandomState(seed)
    norms = np.linalg.norm(smat, axis=1)
    norms[norms == 0.0] = 1.0
    x = smat / norms[:, None]
    n = len(x)
    cents = [x[rng.randint(n)]]
    for _ in range(1, n_centroids):
        sims = np.max(x @ np.stack(cents).T, axis=1)
        cents.append(x[int(np.argmin(sims))])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        newc = np.zeros_like(c)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nm = np.linalg.norm(m)
                newc[j] = m / nm if nm > 0 else c[j]
            else:
                worst = int(np.argmin(np.max(x @ c.T, axis=1)))
                newc[j] = x[worst]
        if np.allclose(newc, c):
            c = newc
            break
        c = newc
    return c


def _vec_rows_smallest_ids(corpus, id_col, vec_col, n):
    """(cid, v) rows of the n smallest-id vectors — the deterministic
    quantizer source shared by ivf_topk and ivfpq_topk (the DuckDB
    twins re-derive exactly this ORDER BY vec_id LIMIT n)."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("v")
        )
        .orderBy("cid")
        .limit(n)
        .collect()
    )


def _vec_rows_sample(corpus, id_col, vec_col, n):
    """Deterministic bounded sample: md5-of-id order, so the trained
    quantizers are reproducible without Date/rand — shared by both
    trainers."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("v")
        )
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(int(n))
        .collect()
    )


def _top_centroids(sims, n: int):
    """Per-row top-n centroid POSITIONS by similarity desc, position
    asc on ties — the one argmax/tie-break rule every quantizer
    consumer (assign, probe, encode; Spark AND the SQL twins) must
    share, so it lives in exactly one place."""
    import numpy as np

    idx = np.arange(sims.shape[1])[None, :].repeat(len(sims), 0)
    return np.lexsort((idx, -sims), axis=1)[:, :n]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: bool = False,
    train_sample: int = 10_000,
    train_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: the classic coarse-quantizer scale
    path.  Corpus vectors are assigned to their nearest centroid
    (one inverted list per centroid); each query probes only its
    `n_probe` nearest centroids' lists and exact-ranks inside that
    candidate set — the per-query work drops from |corpus| to
    ~|corpus|·n_probe/n_centroids.

    Two coarse quantizers behind ONE plan shape:

    - default (train=False): DETERMINISTIC — the `n_centroids`
      smallest-id corpus vectors serve as centroids.  k-means would
      churn across engines/runs, and determinism is what makes the
      DuckDB twin possible, so this stays the catalog/oracle path.
    - train=True: sampled spherical k-means — a DRIVER-BOUNDED loop
      (≤ train_sample vectors, picked by the md5-of-id order so the
      sample is itself deterministic; kmeans++-style farthest-first
      seeding from `seed`; ≤ train_iters Lloyd rounds on the sample
      only).  The cluster does one extra TakeOrdered for the sample;
      assignment/probe/re-rank plans are IDENTICAL — the centroid
      matrix is still just a broadcast.  This is the production
      quantizer: at 10^12 vectors use n_centroids ≈ √N and the same
      bounded sample (quality plateaus long before the sample does).

    Plan shape: centroid matrix broadcast (n_centroids × dim doubles,
    dimension-sized); assignment = one BLAS argmax per Arrow batch
    emitting narrow (id, cid) rows; candidates = probe-list equi-join
    on cid; exact re-rank joins vectors back (probe side broadcast);
    top-k via a window PARTITIONED BY query — per-key heaps, no
    global sort.  Ties break toward the smaller centroid / neighbor
    id, mirrored in the SQL twin.

    Output (query_id, rank, neighbor_id), rank 1..k."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    if train:
        sample_rows = _vec_rows_sample(corpus, id_col, vec_col, train_sample)
        smat = np.stack(
            [np.asarray(r["v"], dtype=np.float64) for r in sample_rows]
        )
        cmat = _kmeans_spherical(
            smat, min(n_centroids, len(smat)), train_iters, seed
        )
        cids = np.arange(len(cmat), dtype=np.int64)
    else:
        cent_rows = _vec_rows_smallest_ids(corpus, id_col, vec_col, n_centroids)
        cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
        cmat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in cent_rows])
    cnrm = np.linalg.norm(cmat, axis=1)
    cnrm[cnrm == 0.0] = 1.0
    bc = corpus.sparkSession.sparkContext.broadcast((cids, cmat, cnrm))

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("cid", T.LongType())]
    )

    def assign(n_best):
        def run(batches):
            ids_c, mat_c, nrm_c = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                vid = pdf["id"].to_numpy(dtype=np.int64)
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
                sims = (mat @ mat_c.T) / (
                    np.linalg.norm(mat, axis=1)[:, None] * nrm_c[None, :]
                )
                # lexsort: primary -sim desc, secondary centroid id asc
                nb = min(n_best, sims.shape[1])
                order = np.lexsort(
                    (np.broadcast_to(ids_c, sims.shape), -sims), axis=1
                )[:, :nb]
                yield pd.DataFrame(
                    {
                        "id": np.repeat(vid, nb),
                        "cid": ids_c[order].ravel(),
                    }
                )

        return run

    csrc = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    qsrc = queries.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    lists = csrc.mapInPandas(assign(1), schema)
    probes = qsrc.mapInPandas(assign(n_probe), schema).select(
        F.col("id").alias("query_id"), "cid"
    )
    cand = (
        probes.join(lists, "cid")
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q_count = queries.count()
    scored = (
        cand.join(F.broadcast(qv) if q_count <= 100_000 else qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _kmeans_l2(smat, n_centroids: int, iters: int, seed: int):
    """Plain (L2) Lloyd k-means on a driver-resident sample — the PQ
    sub-quantizer trainer.  Same bounded-driver-work contract as
    _kmeans_spherical; an emptied cluster reseeds to the point with
    the largest distance to its nearest centroid."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(smat)
    cents = [smat[rng.randint(n)]]
    for _ in range(1, n_centroids):
        d = np.min(
            ((smat[:, None, :] - np.stack(cents)[None, :, :]) ** 2).sum(-1),
            axis=1,
        )
        cents.append(smat[int(np.argmax(d))])
    c = np.stack(cents)
    for _ in range(iters):
        d = ((smat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d, axis=1)
        newc = c.copy()
        # worst-served points first, popped one per empty cluster so
        # two emptied clusters never reseed to the same point (which
        # would leave duplicate codebook entries)
        reseed = iter(np.argsort(-np.min(d, axis=1)))
        for j in range(n_centroids):
            members = smat[assign == j]
            if len(members):
                newc[j] = members.mean(axis=0)
            else:
                newc[j] = smat[int(next(reseed))]
        if np.allclose(newc, c):
            c = newc
            break
        c = newc
    return c


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: bool = False,
    train_sample: int = 10_000,
    train_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF + product quantization (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — public literature):
    the memory-scale path past plain IVF.  Each corpus vector is
    stored in the inverted lists as (coarse centroid id, m sub-space
    code bytes) — ~(8+m) bytes instead of dim×4 — so the searchable
    index for 10^9-10^10 vectors fits executor memory where raw
    vectors cannot.  Queries probe `n_probe` coarse lists and rank
    candidates by ADC (asymmetric distance computation): one
    m×n_codes lookup table of sub-space inner products per query,
    sim̂ = <q, c_coarse> + Σ_j LUT[j][code_j].

    Metric: cosine via L2-normalized vectors; residual encoding
    (x̂ = c + Σ_j cb_j[code_j]) over the normalized space.

    Quantizer twins, mirroring ivf_topk:
    - default (train=False): DETERMINISTIC — coarse centroids are
      the n_centroids smallest-id vectors; sub-space codebooks are
      the residual slices of the n_codes smallest-id vectors.  This
      is the catalog/oracle path (the DuckDB twin derives the exact
      same codebooks in SQL).
    - train=True: spherical k-means coarse + per-sub-space L2
      k-means on the SAME bounded sample's residuals — the
      production quantizer, identical plan shape (codebooks are
      still one broadcast).

    Plan shape: broadcast quantizers; corpus encode = one BLAS pass
    per Arrow batch emitting narrow (id, cid, codes) rows — THE
    compressed index, the only corpus-sized table in play; query
    pass emits (query_id, cid, cdot, lut); candidates = probe
    equi-join on cid; ADC scoring is pure Catalyst
    (zip_with + aggregate over the broadcast-joined LUT, sequential
    summation matching the SQL twin's list_sum); top-k via a
    per-query window.  Ranking uses sim rounded to 12 digits with an
    id tie-break so cross-engine float noise cannot flip ranks.

    Output (query_id, rank, neighbor_id), rank 1..k."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    from ferenda_spark.operators.query import round_portable

    first = corpus.select(_as_double(F.col(vec_col)).alias("v")).first()
    if first is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long"
        )
    dim = len(first["v"])
    if dim % m:
        raise ValueError(f"ivfpq: dim {dim} not divisible by m={m}")
    dsub = dim // m

    def _norm_rows(mat):
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0.0] = 1.0
        return mat / nrm[:, None]

    if train:
        sample_rows = _vec_rows_sample(corpus, id_col, vec_col, train_sample)
        smat = _norm_rows(
            np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample_rows])
        )
        cmat = _kmeans_spherical(
            smat, min(n_centroids, len(smat)), train_iters, seed
        )
        # residuals of the sample under the trained coarse quantizer
        asg = np.argmax(smat @ cmat.T, axis=1)
        res = smat - cmat[asg]
        books = np.stack(
            [
                _kmeans_l2(
                    res[:, j * dsub : (j + 1) * dsub],
                    min(n_codes, len(res)),
                    train_iters,
                    seed + 1 + j,
                )
                for j in range(m)
            ]
        )
    else:
        cent_rows = _vec_rows_smallest_ids(
            corpus, id_col, vec_col, max(n_centroids, n_codes)
        )
        allmat = _norm_rows(
            np.stack([np.asarray(r["v"], dtype=np.float64) for r in cent_rows])
        )
        cmat = allmat[:n_centroids]
        # deterministic codebooks: residual slices of the smallest-id
        # vectors under the same coarse quantizer
        cb_src = allmat[:n_codes]
        asg = _top_centroids(cb_src @ cmat.T, 1)[:, 0]
        res = cb_src - cmat[asg]
        books = np.stack(
            [res[:, j * dsub : (j + 1) * dsub] for j in range(m)]
        )
    bc = corpus.sparkSession.sparkContext.broadcast((cmat, books, dsub, m))

    enc_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        cmat_c, books_c, dsub_c, m_c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vid = pdf["id"].to_numpy(dtype=np.int64)
            mat = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            )
            sims = mat @ cmat_c.T
            asg_b = _top_centroids(sims, 1)[:, 0]
            res_b = mat - cmat_c[asg_b]
            codes = np.empty((len(mat), m_c), dtype=np.int32)
            for j in range(m_c):
                sub = res_b[:, j * dsub_c : (j + 1) * dsub_c]
                d = (
                    (sub[:, None, :] - books_c[j][None, :, :]) ** 2
                ).sum(-1)
                codes[:, j] = np.argmin(d, axis=1)  # first-min tie-break
            yield pd.DataFrame(
                {
                    "id": vid,
                    "cid": asg_b.astype(np.int64),
                    "codes": list(codes),
                }
            )

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("cdot", T.DoubleType()),
            T.StructField("lut", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )

    def probe(batches):
        cmat_c, books_c, dsub_c, m_c = bc.value
        nb = min(n_probe, cmat_c.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            vid = pdf["id"].to_numpy(dtype=np.int64)
            mat = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            )
            sims = mat @ cmat_c.T
            order = _top_centroids(sims, nb)
            rows = []
            for r_i in range(len(mat)):
                lut = [
                    list(
                        mat[r_i, j * dsub_c : (j + 1) * dsub_c]
                        @ books_c[j].T
                    )
                    for j in range(m_c)
                ]
                for cid in order[r_i]:
                    rows.append(
                        (
                            int(vid[r_i]),
                            int(cid),
                            float(sims[r_i, cid]),
                            lut,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["query_id", "cid", "cdot", "lut"]
            )

    csrc = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    qsrc = queries.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    lists = csrc.mapInPandas(encode, enc_schema)
    probes = qsrc.mapInPandas(probe, probe_schema)

    # ADC score — pure Catalyst over the joined code/LUT arrays:
    # sequential fold, same summation order as the SQL twin
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        probes.join(lists, "cid")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            round_portable(F.col("cdot") + adc, 12).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
