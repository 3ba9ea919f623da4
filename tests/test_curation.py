"""Corpus-curation operators: repetition signals, host-stratified
splits, host aggregates, contamination detection, PII scanning.
Semantics tests on hand-built corpora; cross-engine value equality is
covered by tools/selfcheck.py + the driver's DuckDB gate."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import curation as CU

DOCS = [
    # doc 0: 'spam' 4/8 tokens; "spam spam" 2-gram repeats
    (0, "spam spam spam spam egg and ham today", "host-a.example", "en"),
    (1, "all different words here nothing repeats ever once", "host-a.example", "en"),
    (2, "one two one two one two one two", "host-b.example", "de"),
    (3, "tiny", "host-c.example", "en"),
    (4, "", "host-c.example", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "source", "lang"])


def test_repetition_signals(docs):
    rows = {
        r["id"]: r
        for r in CU.repetition_signals(docs, "text", "doc_id").collect()
    }
    assert rows[0]["n_tokens"] == 8
    assert rows[0]["top_word_frac"] == 0.5          # spam x4 / 8
    # doc0 2-grams: 7 total, dups: "spam spam" appears 3x (2 dup) -> 2/7
    assert rows[0]["dup_2gram_frac"] == round(2 / 7, 6)
    assert rows[1]["top_word_frac"] == 0.125        # all singletons, 1/8
    assert rows[1]["dup_2gram_frac"] == 0.0
    assert rows[1]["dup_3gram_frac"] == 0.0
    # doc2: "one two" x4 + "two one" x3 -> 7 2-grams, 2 distinct
    assert rows[2]["dup_2gram_frac"] == round(5 / 7, 6)
    assert rows[2]["top_word_frac"] == 0.5
    # shorter than k -> no k-grams -> 0.0 by contract
    assert rows[3]["dup_2gram_frac"] == 0.0
    assert rows[3]["dup_3gram_frac"] == 0.0
    assert rows[3]["top_word_frac"] == 1.0
    # empty text normalizes to [''] (one empty token)
    assert rows[4]["n_tokens"] == 1


def test_host_split_deterministic_and_host_pure(docs, spark):
    out = CU.host_split(docs, "source", "doc_id")
    rows = out.collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # same host -> same split, always
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_host.values())
    # deterministic across runs
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, CU.host_split(docs, "source", "doc_id").collect())
    )
    # thresholds: md5-first-byte space splits ~90/5/5; check the
    # boundary arithmetic on a crafted host whose md5 is known
    one = spark.createDataFrame([(1, "h")], ["doc_id", "source"])
    got = CU.host_split(one, "source", "doc_id", "00", "ff").collect()[0]
    assert got["split"] == "val"  # every hash >= '00' and < 'ff'... except 'ff*'


def test_host_aggregates(docs):
    rows = {r["host"]: r for r in CU.host_aggregates(docs, "source", "text", "lang").collect()}
    assert rows["host-a.example"]["n_docs"] == 2
    assert rows["host-a.example"]["total_tokens"] == 16
    assert rows["host-a.example"]["mean_doc_tokens"] == 8.0
    assert rows["host-a.example"]["n_langs"] == 1
    assert rows["host-a.example"]["keep"] is True
    assert rows["host-b.example"]["keep"] is False  # 1 doc < min_docs=2


def test_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # contains bench 4-gram
            (1, "alpha beta gamma delta"),                 # the 4-gram exactly
            (2, "totally clean document with fresh text"),
            (3, "alpha beta gamma"),                       # only 3 tokens of it
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    got = {
        r["id"]: r["n_hits"]
        for r in CU.contamination(corpus, bench, "text", "doc_id", k=4).collect()
    }
    # bench 4-grams: "alpha beta gamma delta", "beta gamma delta epsilon"
    assert got == {0: 2, 1: 1}


def test_pii_scan(spark):
    df = spark.createDataFrame(
        [
            (0, "contact John.Doe@Example.COM or +1 (555) 123-4567 room 12"),
            (1, "no pii here at all"),
            (2, "two mails: a@b.io c@d.org and id 4242"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in CU.pii_scan(df, "text", "doc_id").collect()}
    assert rows[0]["n_emails"] == 1
    assert rows[0]["n_phones"] == 1
    assert rows[0]["n_digit_seqs"] >= 3   # 555, 123, 4567, 12 (some inside phone)
    assert rows[1]["n_emails"] == rows[1]["n_phones"] == rows[1]["n_digit_seqs"] == 0
    assert rows[2]["n_emails"] == 2
    # redaction: both PII docs hash differently from raw, clean doc == raw md5
    raw = {r["doc_id"]: r["m"] for r in df.select("doc_id", F.md5(F.lower("text")).alias("m")).collect()}
    assert rows[0]["redacted_md5"] != raw[0]
    assert rows[1]["redacted_md5"] == raw[1]
    assert rows[2]["redacted_md5"] != raw[2]


def test_repetition_no_shuffle_plan(docs):
    """The repetition operator must stay a pure projection: no
    Exchange in the optimized plan (the 100x scale contract)."""
    plan = CU.repetition_signals(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_split_no_shuffle_plan(docs):
    plan = CU.host_split(docs, "source", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_urls(spark):
    """Canonicalization rules: case-fold scheme/host, drop default
    port / keep non-default, drop fragment, strip tracking params,
    sort survivors, empty path -> '/', non-URL passthrough."""
    from ferenda_spark.operators.curation import normalize_urls

    cases = [
        ("HTTPS://WWW.Ex.COM:443/A?utm_source=x&b=2&a=1#f",
         "https://www.ex.com/A?a=1&b=2", "www.ex.com"),
        ("http://ex.com:80", "http://ex.com/", "ex.com"),
        ("http://ex.com:8080/p?ref=tw&id=7", "http://ex.com:8080/p?id=7", "ex.com"),
        ("https://ex.com/p?gclid=1&fbclid=2&utm_campaign=c", "https://ex.com/p", "ex.com"),
        ("https://ex.com/p?", "https://ex.com/p", "ex.com"),
        ("not a url", "not a url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    got = {
        r.url: (r.canon_url, r.url_host)
        for r in normalize_urls(df, "url").collect()
    }
    for u, canon, host in cases:
        assert got[u] == (canon, host), (u, got[u], (canon, host))
    # pure projection — no Exchange in the optimized plan
    plan = (
        normalize_urls(df, "url")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_clean_lines(spark):
    from ferenda_spark.operators.curation import clean_lines

    page = "\n".join(
        [
            "Home | About | Contact",            # no terminal punct
            "This sentence survives the cut.",   # keep
            "OK!",                               # < 3 words
            "We use Cookie banners here.",       # blacklist (case-insens)
            "  Padded but otherwise fine too.  ",# keep (trimmed)
            "© 2024 Footer Corp.",               # blacklist ©
            "what about this one?",              # keep (terminal ?)
        ]
    )
    rows = [(0, page), (1, ""), (2, None), (3, "all lines fail here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in clean_lines(df, "text", "doc_id").collect()}
    assert out[0]["clean_text"] == (
        "This sentence survives the cut.\n"
        "Padded but otherwise fine too.\n"
        "what about this one?"
    )
    assert (out[0]["n_lines"], out[0]["n_lines_removed"]) == (7, 4)
    assert out[1] ["clean_text"] == "" and out[1]["n_lines"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_lines"] == 0
    assert (out[3]["n_lines"], out[3]["n_lines_removed"]) == (1, 1)


def test_sequence_pack_plan(spark):
    from ferenda_spark.operators.curation import sequence_pack_plan

    # token counts: 3, 5, 2, 4 -> starts 0, 3, 8, 10; seq_len=4:
    # seq ids 0,0,2,2; offsets 0,3,0,2.  shard_size=2 forces the
    # two-phase path (2 shards with a nonzero prefix for shard 1)
    rows = [
        (0, "a b c"),
        (1, "d e f g h"),
        (2, "i j"),
        (3, "k l m n"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["n_tokens"], r["global_start"], r["seq_id"], r["seq_offset"])
        for r in sequence_pack_plan(
            df, "text", "doc_id", seq_len=4, shard_size=2
        ).collect()
    }
    assert out == {
        0: (3, 0, 0, 0),
        1: (5, 3, 0, 3),
        2: (2, 8, 2, 0),
        3: (4, 10, 2, 2),
    }


def test_sequence_pack_plan_window_is_shard_partitioned(spark):
    from ferenda_spark.operators.curation import sequence_pack_plan

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("w x y z").alias("text")
    )
    plan = (
        sequence_pack_plan(df, "text", "doc_id", shard_size=100)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the doc-level cumsum window must carry the shard partition key
    # (no global no-partition window over the full doc table)
    import re as _re

    doc_windows = [
        ln for ln in plan.split("\n") if "windowspecdefinition" in ln.lower()
    ]
    assert doc_windows, plan
    # every window over the doc table partitions by shard; the only
    # unpartitioned window is the |shards|-row prefix cumsum
    unpart = [
        ln
        for ln in doc_windows
        if "shard" not in ln.split("windowspecdefinition")[1][:80]
    ]
    assert len(unpart) <= 1, plan


def test_weighted_sample(spark):
    from ferenda_spark.operators.curation import weighted_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "host"])
    out = weighted_sample(
        df, "host", "doc_id", rates={"a": 0.0}, default_rate=0.5
    ).collect()
    keys = {r["key"] for r in out}
    assert keys == {"b"}                       # rate 0 drops every 'a'
    assert 20 <= len(out) <= 80                # ~50% of the 100 'b' rows
    assert all(0.0 <= r["u"] < 0.5 for r in out)
    # deterministic: same call, identical sample
    again = weighted_sample(
        df, "host", "doc_id", rates={"a": 0.0}, default_rate=0.5
    ).collect()
    assert {(r["id"], r["u"]) for r in again} == {(r["id"], r["u"]) for r in out}
    # rate 1.0 keeps everything
    full = weighted_sample(df, "host", "doc_id", rates={}, default_rate=1.0)
    assert full.count() == 200
    # pure projection: no shuffle
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_unicode(spark):
    from ferenda_spark.operators.curation import normalize_unicode

    rows = [
        (1, "plain ascii stays"),
        (2, "cafe\u0301 decomposed"),          # e + combining acute
        (3, "a\u0301lready a\u0301 lot"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in normalize_unicode(df, "text").collect()}
    assert out[1] == "plain ascii stays"
    assert out[2] == "caf\u00e9 decomposed"     # precomposed é
    assert out[3] == "\u00e1lready \u00e1 lot"
    assert out[4] is None
    assert out[5] == ""
    # NFD round-trips back to decomposed
    nfd = {
        r["doc_id"]: r["text"]
        for r in normalize_unicode(
            normalize_unicode(df, "text"), "text", form="NFD"
        ).collect()
    }
    assert nfd[2] == "cafe\u0301 decomposed"
    # pure projection: no shuffle
    plan = (
        normalize_unicode(df, "text")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_fix_mojibake(spark):
    from ferenda_spark.operators.curation import fix_mojibake

    orig = "café – naïve résumé"
    single = orig.encode("utf-8").decode("iso-8859-1")
    double = single.encode("utf-8").decode("iso-8859-1")
    rows = [
        (1, single),                      # classic utf8-as-latin1
        (2, double),                      # doubly mangled
        (3, "plain ascii"),               # untouched, JVM fast path
        (4, "clean café stays"),     # clean non-ASCII untouched
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in fix_mojibake(df, "text").collect()}
    assert out[1] == orig
    assert out[2] == orig
    assert out[3] == "plain ascii"
    assert out[4] == "clean café stays"
    assert out[5] is None
    # pure projection: no shuffle
    plan = fix_mojibake(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_clean_lines_string_ids(spark):
    """String (url) ids must group per-document, not collapse into
    one id=NULL row via a lossy numeric cast."""
    from ferenda_spark.operators.curation import clean_lines

    rows = [
        ("https://a.example/x", "First doc line stays here.\nno punct line"),
        ("https://b.example/y", "Second doc keeps this too."),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r["id"]: r for r in clean_lines(df, "text", "url").collect()}
    assert set(out) == {"https://a.example/x", "https://b.example/y"}
    assert out["https://a.example/x"]["clean_text"] == "First doc line stays here."
    assert out["https://b.example/y"]["n_lines_removed"] == 0


def test_weighted_sample_null_key_uses_default(spark):
    """NULL key/id rows still draw (the '' bucket) — default_rate=1.0
    keeps EVERYTHING, including rows with no host."""
    from ferenda_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [("a.com", 1), (None, 2), ("b.com", None), (None, None)],
        "host string, doc int",
    )
    out = weighted_sample(df, "host", "doc", rates={}, default_rate=1.0)
    assert out.count() == 4
    # rate override still applies to non-null keys; null keys are
    # never silently dropped by a 0-rate override on some real domain
    out2 = weighted_sample(df, "host", "doc", rates={"a.com": 0.0})
    got = {(r["key"] or "", r["id"]) for r in out2.collect()}
    assert ("a.com", 1) not in got and ("", 2) in got


def test_pii_phone_inside_email_single_fire(spark):
    """A phone-shaped local part inside an email is ONE email, not
    an email plus a phone (counts mirror the redaction order)."""
    from ferenda_spark.operators.curation import pii_scan

    df = spark.createDataFrame(
        [
            (1, "reach me at +1234567890@mail.example.com"),
            (2, "call +1 (555) 123-4567 or mail a@b.example"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in pii_scan(df, "text", "id").collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (1, 1)


def test_unicode_gate_keeps_clean_rows_in_jvm(spark):
    """The normalize/mojibake gates are filter/union splits because
    a Python UDF under CASE WHEN evaluates for EVERY row: assert
    only the non-ASCII minority actually crosses into Python."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ferenda_spark.operators import curation

    df = spark.createDataFrame(
        [(i, "plain ascii row") for i in range(97)]
        + [(97, "café row"), (98, None), (99, "naïve")],
        "id int, text string",
    )
    crossed = spark.sparkContext.accumulator(0)

    out = curation.normalize_unicode(df, "text")
    # plan-level proof: the Python node sits above a FILTERED scan,
    # not above the full input (the union's clean branch is JVM-only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "Python" in plan
    assert out.count() == 100

    # empirical proof with a counting twin of the same split shape
    @pandas_udf("string")
    def probe(s: pd.Series) -> pd.Series:
        crossed.add(len(s))
        return s

    t = F.col("text")
    needs = t.isNotNull() & t.rlike("[^\\u0000-\\u007F]")
    clean = df.filter(t.isNull() | ~t.rlike("[^\\u0000-\\u007F]"))
    dirty = df.filter(needs).withColumn("text", probe(t))
    # collect (count() would prune the UDF column away entirely)
    assert len(clean.unionByName(dirty).collect()) == 100
    assert crossed.value == 2  # only café + naïve crossed into Python
