"""Training-data operators: dedup, similarity, text stats,
multimodal plumbing.  Semantics tests on hand-built corpora plus
recall/robustness properties; cross-engine value equality is covered
by tools/selfcheck.py + the driver's DuckDB gate."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import dedup as D
from ferenda_spark.operators import multimodal as M
from ferenda_spark.operators import similarity as S
from ferenda_spark.operators import textstats as X

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "The  quick brown fox jumps over the lazy dog "),  # exact dup of 0 mod ws/case
    (3, "completely different words entirely unrelated text corpus"),
    (4, "x"),                                              # shorter than shingle k
    (5, ""),                                               # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    groups = {
        r["representative"]: r["n_copies"]
        for r in D.exact_dedup_groups(docs, "text", "doc_id").collect()
    }
    assert groups[0] == 2          # 0 and 2 collapse
    assert groups[1] == 1
    assert sum(groups.values()) == 6


def test_jaccard_finds_neardup(docs):
    sh = D.word_shingles(docs, "text", "doc_id", k=3)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.jaccard_pairs(sh, 0.3).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and 0.4 < pairs[(0, 1)] < 0.9
    assert all(3 not in p for p in pairs)


def test_minhash_lsh_candidates(docs):
    sh = D.word_shingles(docs, "text", "doc_id", k=3)
    sig = D.minhash_signatures(sh, n_hashes=8)
    assert sig.groupBy("id").count().filter("count != 8").count() == 0
    cands = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig, 4, 2).collect()}
    assert (0, 2) in cands  # identical shingle sets always collide
    assert (0, 3) not in cands


def test_lsh_bucket_cap_bounds_boilerplate(spark):
    """Pathological boilerplate corpus: 30 byte-identical docs share
    EVERY band bucket, so uncapped LSH emits all 30·29/2 pairs; with
    max_bucket_size=10 the counted semi-join drops those buckets
    before the self-join and the candidate set is bounded (here: 0
    from the hot bucket).  A small legit near-dup pair in the same
    corpus — below the cap — must survive."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(30)]
    rows += [(100, "zebra yak xylophone walrus vulture unicorn tiger snake"),
             (101, "zebra yak xylophone walrus vulture unicorn tiger snake")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = D.minhash_signatures(
        D.word_shingles(docs, "text", "doc_id", k=3), n_hashes=8
    )
    uncapped = D.lsh_candidate_pairs(sig, 4, 2, max_bucket_size=None).collect()
    assert len({(r.id_a, r.id_b) for r in uncapped}) >= 30 * 29 // 2
    capped = {(r.id_a, r.id_b)
              for r in D.lsh_candidate_pairs(sig, 4, 2, max_bucket_size=10).collect()}
    assert (100, 101) in capped          # legit small bucket survives
    assert not any(a < 100 and b < 100 for a, b in capped)  # hot bucket dropped
    assert len(capped) < 30 * 29 // 2


def test_duplicate_span_stats(docs):
    # hand-computed at k=5 over DOCS (9 tokens → 5 span positions):
    # docs 0 and 2 normalize identically — all 5 positions of each
    # are cross-doc duplicated; doc 1 shares positions 0-3 ("the
    # quick brown fox jumps" .. "fox jumps over the lazy") with
    # 0/2 but its last span ("jumps over the lazy cat") is unique;
    # doc 3 (7 tokens) has 3 unique spans; docs 4/5 are shorter
    # than k.
    out = {
        r["id"]: r
        for r in D.duplicate_span_stats(docs, "text", "doc_id", k=5).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5}
    for i in (0, 2):
        assert (out[i]["n_spans"], out[i]["n_dup_spans"]) == (5, 5)
        assert out[i]["dup_frac_r6"] == 1.0
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (5, 4)
    assert out[1]["dup_frac_r6"] == pytest.approx(0.8)
    assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (3, 0)
    for i in (4, 5):
        assert (out[i]["n_spans"], out[i]["dup_frac_r6"]) == (0, 0.0)


def test_duplicate_span_counts_repeated_positions(spark):
    # a doc repeating a duplicated span counts every position, and a
    # WITHIN-doc-only repeat is not cross-doc duplicated
    rows = [
        (0, "a b c d e a b c d e"),   # span "a b c d e" at pos 0 and 5
        (1, "a b c d e"),             # shares it -> all of doc 1 dup
        (2, "z z z z z z z z"),       # internal repeats, no other doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in D.duplicate_span_stats(df, "text", "doc_id", k=5).collect()
    }
    # doc 0: 6 positions; positions 0 and 5 are "a b c d e" (dup);
    # the middle 4 spans ("b c d e a" etc.) exist only in doc 0
    assert (out[0]["n_spans"], out[0]["n_dup_spans"]) == (6, 2)
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (1, 1)
    assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (4, 0)


def test_remove_duplicate_spans(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta unique tail here"),
        (1, "alpha beta gamma delta epsilon other words follow now"),
        (2, "totally unrelated content with nothing shared at all"),
        (3, "tiny"),  # shorter than k -> passes through
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in D.remove_duplicate_spans(df, "text", "doc_id", k=5).collect()
    }
    # docs 0/1 share exactly one 5-gram ("alpha beta gamma delta
    # epsilon") -> its 5 tokens are cut from BOTH; the rest stays
    assert out[0]["clean_text"] == "zeta unique tail here"
    assert (out[0]["n_tokens"], out[0]["n_tokens_removed"]) == (9, 5)
    assert out[1]["clean_text"] == "other words follow now"
    assert (out[1]["n_tokens"], out[1]["n_tokens_removed"]) == (9, 5)
    assert out[2]["clean_text"] == rows[2][1]
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["clean_text"] == "tiny"
    assert (out[3]["n_tokens"], out[3]["n_tokens_removed"]) == (1, 0)


def test_remove_duplicate_spans_overlapping_coverage(spark):
    # two docs identical for 6 tokens -> two overlapping dup 5-grams
    # cover token indices 0..5 exactly once each (distinct coverage)
    rows = [
        (0, "a b c d e f x1 y1"),
        (1, "a b c d e f x2 y2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in D.remove_duplicate_spans(df, "text", "doc_id", k=5).collect()
    }
    assert out[0]["clean_text"] == "x1 y1"
    assert out[1]["clean_text"] == "x2 y2"
    assert out[0]["n_tokens_removed"] == out[1]["n_tokens_removed"] == 6


def test_simhash_properties(docs):
    rows = {r.id: r.simhash for r in D.simhash(docs, "text", "doc_id").collect()}
    assert all(len(v) == 32 and set(v) <= {"0", "1"} for v in rows.values())
    assert rows[0] == rows[2]  # normalization-equal docs agree
    ham01 = sum(a != b for a, b in zip(rows[0], rows[1]))
    ham03 = sum(a != b for a, b in zip(rows[0], rows[3]))
    assert ham01 < ham03  # near-dup closer than unrelated


def test_textstats_edge_cases(docs):
    tc = {r.id: (r.n_ws_tokens, r.n_word_tokens) for r in X.token_count(docs, "text", "doc_id").collect()}
    assert tc[0] == (9, 9)
    assert tc[5] == (1, 0)  # empty text → [''] split, zero word tokens
    li = {r.id: r.predicted_lang for r in X.lang_id(docs, "text", "doc_id").collect()}
    assert li[0] == "en"
    assert li[5] == "und"
    q = {r.id: r for r in X.quality_score(docs, "text", "doc_id").collect()}
    assert q[0].quality > q[5].quality
    fp = {r.id: r for r in X.fingerprint(docs, "text", "doc_id").collect()}
    assert fp[0].content_md5 == fp[2].content_md5
    assert fp[0].min_shingle_fp is not None


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ann_lsh_recall(spark, embeddings):
    """LSH top-k must recover most of the exact top-k."""
    probes = embeddings.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(embeddings, probes, k=5).collect()
    }
    # two independent plane seeds: a broken bucketer (wrong signs,
    # dropped tables, bucket collisions across tables) cannot luck
    # past ≥0.8 twice
    for seed in (42, 7):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in S.lsh_topk(embeddings, probes, k=5, seed=seed).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} (seed {seed}) too low"


def test_threshold_pairs_exact_symmetric(spark, embeddings):
    pairs = S.threshold_pairs_exact(embeddings, 0.40).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    got = {(r.id_a, r.id_b) for r in pairs}
    assert len(got) == len(pairs)  # no dup emission


def test_neardup_pairs_lsh_finds_planted_dups(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(40, 64))
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant 5 near-duplicates: id 100+i ~ id i with tiny noise
    for i in range(5):
        rows.append((100 + i, (base[i] + rng.normal(scale=1e-3, size=64)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in S.neardup_pairs(emb, threshold=0.95).collect()}
    exact = {
        (r.id_a, r.id_b) for r in S.threshold_pairs_exact(emb, 0.95).collect()
    }
    assert got <= exact  # the exact re-rank admits no false positives
    planted = {(i, 100 + i) for i in range(5)}
    assert planted <= got  # ~identical vectors always share buckets


def test_resize_images(spark):
    import numpy as np

    # known 2x2 checkerboard, upscaled 2x with nearest-neighbor:
    # each source pixel becomes a 2x2 block
    src = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8
    )
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"img"), ("image/png", 2, 2, None)),
            (2, "image", None, ("image/png", 2, 2, None)),  # no payload: dropped
            (3, "audio", bytearray(b"x"), ("audio/wav", None, None, 10)),
        ],
        M.MEDIA_SCHEMA,
    )
    out = {
        r["id"]: r
        for r in M.resize_images(
            media, 4, 4, decode_rgb=lambda p, w, h: src
        ).collect()
    }
    assert set(out) == {1}
    got = np.frombuffer(bytes(out[1]["rgb"]), dtype=np.uint8).reshape(4, 4, 3)
    want = np.kron(src.reshape(2, 2, 3).transpose(2, 0, 1), np.ones((2, 2))).transpose(
        1, 2, 0
    ).astype(np.uint8)
    assert (got == want).all()
    # deterministic fake decoder: same payload -> same bytes
    a = M.resize_images(media, 3, 3).collect()[0]["rgb"]
    b = M.resize_images(media, 3, 3).collect()[0]["rgb"]
    assert bytes(a) == bytes(b) and len(bytes(a)) == 3 * 3 * 3


def test_threshold_pairs_blocked_matches_exact(spark, embeddings):
    """The distributed block-matrix path must reproduce the exact
    all-pairs result (same semantics, no driver collect)."""
    exact = {
        (r.id_a, r.id_b) for r in S.threshold_pairs_exact(embeddings, 0.40).collect()
    }
    blocked = [
        (r.id_a, r.id_b)
        for r in S.threshold_pairs_blocked(embeddings, 0.40, n_blocks=4).collect()
    ]
    assert len(blocked) == len(set(blocked))  # each pair exactly once
    assert set(blocked) == exact
    assert all(a < b for a, b in blocked)


def test_multimodal_features(spark):
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"\x89PNG fake"), ("image/png", 4, 4, None)),
            (2, "audio", bytearray(b"RIFF fake"), ("audio/wav", None, None, 1500)),
            (3, "video", None, ("video/mp4", None, None, 2500)),
        ],
        M.MEDIA_SCHEMA,
    )
    feats = {r.id: r for r in M.extract_features(media, dim=8).collect()}
    assert len(feats) == 3
    assert len(feats[1].feature) == 8
    assert feats[3].payload_bytes == 0
    # deterministic: same payload → same feature
    again = {r.id: r for r in M.extract_features(media, dim=8).collect()}
    assert feats[1].feature == again[1].feature
    # frame sampling plan from metadata only
    frames = M.frame_sample_plan(media, every_ms=1000).collect()
    assert {(r.id, r.frame_ts_ms) for r in frames} == {(3, 0), (3, 1000), (3, 2000)}
    with pytest.raises(NotImplementedError):
        M.real_decode_stub(b"", "image", 8)


def test_fuzzy_dedup_clusters(docs):
    out = {
        r.id: (r.cluster_rep, r.cluster_size, r.is_dup)
        for r in D.fuzzy_dedup_clusters(
            docs, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert len(out) == 6                       # every doc appears
    assert out[0] == (0, 3, False)             # 0,1,2 one cluster, rep=min
    assert out[1] == (0, 3, True)
    assert out[2] == (0, 3, True)
    assert out[3] == (3, 1, False)             # unrelated → singleton
    assert out[4] == (4, 1, False)             # shorter than k → singleton
    assert out[5] == (5, 1, False)


def test_fuzzy_dedup_transitive_closure(spark):
    # a~b and b~c but a,c share < tau: one cluster of 3 via closure
    rows = [
        (10, "aa bb cc dd ee ff gg hh"),
        (11, "aa bb cc dd ee ff xx yy"),   # overlaps 10 strongly
        (12, "cc dd ee ff xx yy zz ww"),   # overlaps 11, weakly 10
        (13, "qq rr ss tt uu vv"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.id: r.cluster_rep
        for r in D.fuzzy_dedup_clusters(df, "text", "doc_id", threshold=0.3).collect()
    }
    assert out[10] == out[11] == out[12] == 10
    assert out[13] == 13


def test_ivf_topk_recall_and_contract(spark, embeddings):
    exact = S.brute_force_topk(embeddings, embeddings.filter(F.col("vec_id") < 5), k=5)
    ivf = S.ivf_topk(
        embeddings,
        embeddings.filter(F.col("vec_id") < 5),
        k=5,
        n_centroids=8,
        n_probe=4,
    )
    got = ivf.collect()
    # contract: ranks are 1..k' dense per query, k' <= 5
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    iv = {(r.query_id, r.neighbor_id) for r in got}
    # probing half the lists on random vectors: expect decent overlap
    assert len(ex & iv) / len(ex) >= 0.4


def test_frame_sample_plan_skips_missing_duration(spark):
    """NULL/zero duration_ms videos contribute no plan rows (they'd
    otherwise each count a spurious frame at ts=0)."""
    from ferenda_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [
            (1, "video", None, ("video/avi", 2, 2, 2500)),
            (2, "video", None, ("video/avi", 2, 2, None)),
            (3, "video", None, ("video/avi", 2, 2, 0)),
            (4, "video", None, None),
        ],
        M.MEDIA_SCHEMA,
    )
    got = sorted(
        (r["id"], r["frame_ts_ms"])
        for r in M.frame_sample_plan(media, every_ms=1000).collect()
    )
    assert got == [(1, 0), (1, 1000), (1, 2000)]


def test_ivfpq_recall_vs_ivf_and_contract(spark, embeddings):
    """IVF+PQ (VERDICT r4 item 7) vs plain IVF under the SAME coarse
    quantizer and probe budget.  What PQ guarantees: identical
    routing (its results come from exactly the lists IVF probes) and
    ranking QUALITY far above chance within those lists — the exact
    rank permutation is NOT preserved when true-neighbor sim gaps
    sit below the quantization error (random sf embeddings are that
    regime), so the assertion compares the mean TRUE similarity of
    PQ's picks against the candidate-set mean, not set equality.
    Contract: dense ranks, self excluded."""
    import numpy as np

    probes = embeddings.filter(F.col("vec_id") < 5)
    # full candidate ranking from IVF (k large enough to keep every
    # candidate of the probed lists)
    ivf_all = S.ivf_topk(
        embeddings, probes, k=10_000, n_centroids=8, n_probe=4
    ).collect()
    cand = {}
    for r in ivf_all:
        cand.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = S.ivfpq_topk(
        embeddings, probes, k=5, n_centroids=8, n_probe=4, m=4, n_codes=16
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        assert r.query_id != r.neighbor_id
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }

    def sim(a, b):
        va, vb = vecs[a], vecs[b]
        return float(
            va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        )

    for q, picks in per_q.items():
        ranks = sorted(rk for rk, _ in picks)
        assert ranks == list(range(1, len(ranks) + 1))
        cand_ids = [n for _, n in cand[q]]
        # routing: PQ results all come from the probed lists
        assert {n for _, n in picks} <= set(cand_ids)
        pq_mean = np.mean([sim(q, n) for _, n in picks])
        all_mean = np.mean([sim(q, n) for n in cand_ids])
        best_mean = np.mean(
            sorted((sim(q, n) for n in cand_ids), reverse=True)[:5]
        )
        # PQ's 5 picks sit well above the candidate mean, toward the
        # exact-top-5 mean
        assert pq_mean > all_mean + 0.3 * (best_mean - all_mean), (
            q, pq_mean, all_mean, best_mean
        )


def test_ivfpq_high_recall_on_tiered_corpus(spark):
    """On a corpus whose true-neighbor sim gaps EXCEED the
    quantization error (sub-clusters inside coarse cells — the
    regime PQ is built for), trained IVF+PQ reaches high recall vs
    exact search."""
    import numpy as np

    rng = np.random.RandomState(11)
    dim = 16
    rows = []
    vid = 0
    for c in range(4):  # coarse cells
        proto = rng.normal(size=dim) * 10
        for s in range(8):  # sub-clusters: the separated tiers
            sub = proto + rng.normal(size=dim) * 3.0
            for _ in range(5):
                v = sub + rng.normal(size=dim) * 0.05
                rows.append((vid, [float(x) for x in v]))
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") % 40 == 2)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, probes, k=4).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.ivfpq_topk(
            emb, probes, k=4, n_centroids=8, n_probe=2,
            m=4, n_codes=16, train=True,
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, recall


def test_ivfpq_rejects_indivisible_dim(spark):
    import pytest

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        S.ivfpq_topk(emb, emb, m=2)


def test_ivf_trained_quantizer_beats_degenerate_deterministic(spark):
    """train=True (sampled spherical k-means, VERDICT r3 item 5) must
    match-or-beat the deterministic first-k-ids quantizer at equal
    n_probe.  The corpus is built so the deterministic pick is
    DEGENERATE — the 8 smallest ids all sit in one of 4 well-separated
    clusters — while k-means recovers the true structure from the
    sample.  Plan shape is identical either way (broadcast centroid
    matrix, assignment pass, probe-list equi-join)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, per = 16, 50
    protos = rng.normal(size=(4, dim)) * 10
    rows = []
    vid = 0
    # ids 0..49: all cluster 0 (the deterministic quantizer's trap)
    for c in range(4):
        for _ in range(per):
            v = protos[c] + rng.normal(size=dim) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") % 50 == 3)  # one per cluster region

    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, probes, k=5).collect()
    }

    def recall(train):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(
                emb, probes, k=5, n_centroids=8, n_probe=2, train=train
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_det, r_trained = recall(False), recall(True)
    assert r_trained >= r_det, (r_trained, r_det)
    assert r_trained >= 0.9, r_trained
