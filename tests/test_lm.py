"""Corpus bigram LM + perplexity filtering (operators/lm.py) —
CCNet-style curation scoring, checked against hand-computed values
and an independent pure-Python model."""

import math

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.lm import (
    BACKOFF_ALPHA,
    perplexity,
    train_bigram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts(spark):
    d = _docs(spark, [(1, "the cat sat on the mat"), (2, "the the the")])
    uni, big = train_bigram_counts(d)
    u = {r["w"]: r["uc"] for r in uni.collect()}
    assert u["the"] == 5 and u["cat"] == 1
    b = {(r["w1"], r["w2"]): r["bc"] for r in big.collect()}
    assert b[("the", "the")] == 2
    assert b[("the", "cat")] == 1
    assert sum(b.values()) == 5 + 2  # (n-1) per doc


def test_perplexity_exact_degenerate(spark):
    """'the the the' scores exactly: score(the|the) = 2/5 → ppl 2.5."""
    d = _docs(spark, [(1, "the cat sat on the mat"), (2, "the the the")])
    out = {r["id"]: r for r in perplexity(d).collect()}
    assert out[2]["n_bigrams"] == 2
    assert out[2]["ppl"] == pytest.approx(2.5, abs=1e-9)


def test_short_docs_absent(spark):
    d = _docs(spark, [(1, "one two three"), (2, "single"), (3, "")])
    ids = {r["id"] for r in perplexity(d).collect()}
    assert ids == {1}


def test_matches_independent_python_model(spark):
    """Differential: an independent dict-based stupid-backoff model
    over a small mixed corpus, incl. an unseen-bigram (backoff)
    path."""
    rows = [
        (1, "alpha beta gamma alpha beta"),
        (2, "gamma gamma beta"),
        (3, "alpha gamma"),  # bigram (alpha,gamma) unique here
        (4, "beta alpha beta gamma"),
    ]
    d = _docs(spark, rows)
    uni: dict = {}
    big: dict = {}
    toks = {i: t.split() for i, t in rows}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = sum(uni.values())

    def score(a, b):
        if (a, b) in big:
            return big[(a, b)] / uni[a]
        return BACKOFF_ALPHA * uni[b] / total

    out = {r["id"]: r["ppl"] for r in perplexity(d).collect()}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        nll = [-math.log(score(a, b)) for a, b in zip(ts, ts[1:])]
        want = math.exp(sum(nll) / len(nll))
        assert out[i] == pytest.approx(want, rel=1e-6), i


def test_fluent_scores_below_gibberish(spark):
    """The curation property that matters: under a REFERENCE model
    (CCNet-style held-out training via model_docs), fluent prose
    scores far lower perplexity than OOV gibberish.  Note a
    self-trained model can't show this — a doc's own unique bigrams
    score perfectly — which is why model_docs exists."""
    fluent = "the cat sat on the mat and the dog sat on the rug"
    model = _docs(spark, [(i, fluent) for i in range(10)])
    scored = _docs(spark, [(0, fluent), (99, "zq xv jk wp mn bd tg rc lf hs")])
    out = {
        r["id"]: r["ppl"]
        for r in perplexity(scored, model_docs=model).collect()
    }
    assert out[0] < out[99] / 10


def test_plan_is_jvm_only(spark):
    d = _docs(spark, [(1, "a b c")])
    plan = perplexity(d)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
