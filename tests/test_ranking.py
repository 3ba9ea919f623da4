"""HITS and average-precision operators (SURVEY §2.7 W1/W3)."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import query as Q


def test_hits_authorities(spark):
    # star: everyone cites 'x'; 'a' also cites 'y'
    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("a", "y")], ["src", "dst"]
    )
    s = {r.node: r for r in Q.hits(edges, iterations=8).collect()}
    assert s["x"].auth > s["y"].auth > 0
    assert s["a"].hub >= s["b"].hub  # a cites both top authorities
    assert s["x"].hub == 0.0  # x cites nothing


def test_average_precision_known_values(spark):
    # q1: relevant items at ranks 1 and 3 of 4 -> AP = (1/1 + 2/3)/2
    ranked = spark.createDataFrame(
        [("q1", i, r) for i, r in [("a", 1), ("b", 2), ("c", 3), ("d", 4)]]
        + [("q2", i, r) for i, r in [("a", 1), ("b", 2)]],
        ["q", "item", "rnk"],
    )
    gold = spark.createDataFrame(
        [("q1", "a"), ("q1", "c"), ("q2", "z")], ["q", "item"]
    )
    ap = {r.q: r.ap for r in Q.average_precision(ranked, gold, "q", "item", "rnk").collect()}
    assert ap["q1"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    assert ap["q2"] == 0.0  # relevant item never retrieved
    mean_ap = sum(ap.values()) / len(ap)
    assert 0.0 < mean_ap < 1.0
