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


def test_rounds_are_jvm_only(spark):
    syms = initial_symbols(word_counts(_docs(spark)))
    plan = (
        merge_pair(syms, "l", "o")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
