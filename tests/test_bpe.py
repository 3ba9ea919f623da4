"""Distributed BPE training (operators/bpe.py) vs an independent
pure-Python reference implementation of Sennrich et al.'s
algorithm."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.bpe import (
    EOW,
    initial_symbols,
    learn_bpe,
    merge_pair,
    pair_counts,
    word_counts,
)


# -------- independent reference implementation (dict-based classic)


def _py_bpe(texts: list[str], n_merges: int):
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(re.findall("[a-z0-9]+", t.lower()))
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        # max count, lexicographic tie-break — same rule as learn_bpe
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, words


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest",
    "the newest lowest widest",
]


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_initial_symbols(spark):
    syms = {r["word"]: r["syms"] for r in
            initial_symbols(word_counts(_docs(spark))).collect()}
    assert syms["low"] == ["l", "o", "w", EOW]
    assert syms["the"] == ["t", "h", "e", EOW]


def test_pair_counts_match_python(spark):
    _, _, words = _py_bpe(TEXTS, 0)
    from collections import Counter

    want: Counter = Counter()
    for w, n in words.items():
        syms = list(w) + [EOW]
        for a, b in zip(syms, syms[1:]):
            want[(a, b)] += n
    got = {
        (r["a"], r["b"]): r["pc"]
        for r in pair_counts(initial_symbols(word_counts(_docs(spark)))).collect()
    }
    assert got == dict(want)


def test_merge_pair_greedy_nonoverlapping(spark):
    df = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a", EOW])], "word string, wc long, syms array<string>"
    )
    out = merge_pair(df, "a", "a").collect()[0]["syms"]
    assert out == ["aa", "a", EOW]  # leftmost-first, no overlap


def test_learn_bpe_matches_python_model(spark):
    n = 12
    want_merges, want_vocab, _ = _py_bpe(TEXTS, n)
    merges, syms = learn_bpe(_docs(spark), n)
    assert merges == want_merges
    got = {r["word"]: r["syms"] for r in syms.collect()}
    assert got == want_vocab
    syms.unpersist()


def _py_bpe_batched(texts: list[str], n_merges: int, k: int,
                    candidate_factor: int = 4):
    """Independent Python model of the BATCHED algorithm: per round,
    count pairs once, keep the top-k symbol-disjoint ones (count
    desc, lexicographic tie-break), apply them all."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(re.findall("[a-z0-9]+", t.lower()))
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    rounds = 0
    while len(merges) < n_merges:
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ranked = ranked[: max(candidate_factor * k, k)]
        used: set = set()
        batch = []
        want = min(k, n_merges - len(merges))
        for (a, b), n in ranked:
            if n < 2:
                break
            if {a, b, a + b} & used:
                continue
            batch.append((a, b))
            used |= {a, b, a + b}
            if len(batch) == want:
                break
        if not batch:
            break
        merges.extend(batch)
        rounds += 1
        mset = {(a, b): a + b for a, b in batch}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in mset:
                    out.append(mset[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, rounds


def test_learn_bpe_batched_matches_python_batched_model(spark):
    """Exact differential vs the independent Python batched model —
    characterizes the batched algorithm completely (same selection,
    same application)."""
    from ferenda_spark.operators.bpe import learn_bpe_batched

    n, k = 12, 4
    want_merges, want_vocab, want_rounds = _py_bpe_batched(TEXTS, n, k)
    merges, syms, rounds = learn_bpe_batched(_docs(spark), n, k=k)
    assert merges == want_merges
    assert rounds == want_rounds
    got = {r["word"]: r["syms"] for r in syms.collect()}
    assert got == want_vocab
    syms.unpersist()


def test_batched_first_merge_per_round_is_sequential_argmax(spark):
    """The deviation characterization: every batch LEADS with the
    true sequential argmax; only later in-batch picks may diverge
    from strict-sequential BPE (which would recount after each
    merge).  On this fixture k=2 stays fully equivalent to the
    sequential list as a set."""
    from ferenda_spark.operators.bpe import learn_bpe_batched

    seq_merges, seq_vocab, _ = _py_bpe(TEXTS, 8)
    merges, syms, rounds = learn_bpe_batched(_docs(spark), 8, k=2)
    assert merges[0] == seq_merges[0]
    # batched tokenization of the fixture vocabulary agrees with
    # sequential here (disjoint tiers) even though ORDER may differ
    assert set(merges) == set(seq_merges)
    got = {r["word"]: r["syms"] for r in syms.collect()}
    assert got == seq_vocab
    syms.unpersist()


def test_batched_round_count_amortizes(spark):
    """256 merges on a pair-rich corpus complete in <=32 driver
    rounds (the VERDICT r4 item-4 target: O(n_merges/k) jobs)."""
    import random

    from ferenda_spark.operators.bpe import learn_bpe_batched

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = []
    for _ in range(600):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 10)))
        words.extend([w] * rng.randint(1, 50))
    rng.shuffle(words)
    texts = [" ".join(words[i::8]) for i in range(8)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges, syms, rounds = learn_bpe_batched(docs, 256, k=16)
    assert len(merges) == 256
    assert rounds <= 32, rounds
    # all merges unique and applied
    assert len(set(merges)) == 256
    syms.unpersist()


def test_merge_pairs_batch_equals_sequential_application(spark):
    """Disjoint batch applied in one fold == the same merges applied
    one at a time (the precondition-backed equivalence)."""
    from ferenda_spark.operators.bpe import merge_pair, merge_pairs

    df = spark.createDataFrame(
        [
            ("lower", 1, ["l", "o", "w", "e", "r", EOW]),
            ("newer", 1, ["n", "e", "w", "e", "r", EOW]),
            ("aaa", 1, ["a", "a", "a", EOW]),
        ],
        "word string, wc long, syms array<string>",
    )
    batch = [("l", "o"), ("e", "r"), ("a", "a")]
    one = {r["word"]: r["syms"] for r in merge_pairs(df, batch).collect()}
    seq = df
    for a, b in batch:
        seq = merge_pair(seq, a, b)
    two = {r["word"]: r["syms"] for r in seq.collect()}
    assert one == two
    assert one["aaa"] == ["aa", "a", EOW]


def test_rounds_are_jvm_only(spark):
    syms = initial_symbols(word_counts(_docs(spark)))
    plan = (
        merge_pair(syms, "l", "o")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
