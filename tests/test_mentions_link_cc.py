"""Unit tests: mention patterns, entity linking, connected components."""

import random

from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.functions.patterns import scan_text
from ferenda_spark.operators.canonicalize import connected_components
from ferenda_spark.operators.link import gazetteer_df, link_names

CFG = PipelineConfig()


def test_scan_masking_and_traps():
    t = ("As defined in section 2.1 of RFC 1010, the rules apply. "
         "This extends RFC 1020. Compare section 3 above. "
         "(see https://host-1.example.org/rfc/1030) "
         "More at https://x.org/a. See https://y.org/b, too.")
    got = scan_text(t)
    by = [(m["pattern"], m["mention_text"]) for m in got]
    assert ("sec_of_rfc", "section 2.1 of RFC 1010") in by
    assert ("rfc", "RFC 1020") in by
    # masked: the RFC 1010 inside sec_of_rfc must NOT reappear
    assert ("rfc", "RFC 1010") not in by
    assert ("section_internal", "section 2.1") not in by
    assert ("section_internal", "section 3") in by
    assert ("url", "https://host-1.example.org/rfc/1030") in by
    assert ("url", "https://x.org/a") in by
    assert ("url", "https://y.org/b") in by


def test_link_exact_alt_fuzzy(spark):
    gaz = gazetteer_df(spark, CFG)
    names = spark.createDataFrame(
        [
            ("u1", "Internet Engineering Task Force"),   # exact
            ("u2", "IETF Secretariat"),                   # alt label
            ("u3", "Internet Enigneering Task Force"),    # misspelled -> fuzzy
            ("u4", "Totally Unknown Org Zzz"),            # no link
        ],
        "url string, publisher_name string",
    )
    got = {
        r["url"]: (r["entity_label"], r["link_method"])
        for r in link_names(names, gaz, CFG).collect()
    }
    assert got["u1"] == ("Internet Engineering Task Force", "exact")
    assert got["u2"] == ("Internet Engineering Task Force", "exact")
    assert got["u3"] == ("Internet Engineering Task Force", "fuzzy")
    assert got["u4"][0] is None


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress
    return {x: find(x) for x in parent}


def test_connected_components_vs_oracle(spark):
    rng = random.Random(7)
    edges = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}") for _ in range(80)]
    edges += [(f"c{i}", f"c{i+1}") for i in range(40)]  # long chain
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["uri"]: r["canon_uri"] for r in connected_components(df).collect()
    }
    # the distributed star path must produce the identical map
    got_dist = {
        r["uri"]: r["canon_uri"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got == got_dist
    want = _uf_oracle([(a, b) for a, b in edges if a != b])
    # canonical label must be the component min for every member
    comp = {}
    for node, root in want.items():
        comp.setdefault(root, []).append(node)
    expect = {}
    for root, members in comp.items():
        m = min(members)
        for node in members:
            expect[node] = m
    # isolated self-loops are dropped by CC; compare on shared keys
    assert set(expect) == set(got)
    assert expect == got


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df).count() == 0
