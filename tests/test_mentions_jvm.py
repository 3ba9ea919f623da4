"""Differential test: the Catalyst-expression mention scan
(detect_mentions engine='jvm') must be byte-identical to the
pandas-UDF reference engine (engine='python' -> patterns.scan_text)
on the synthetic corpus AND on adversarial literals, plus a
randomized property sweep over generated mention-dense texts."""

import random

from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.operators.extract import extract_docs
from ferenda_spark.operators.mentions import detect_mentions
from ferenda_spark.operators.segment import segment_sections
from ferenda_spark.sources.pages import synth_pages

CFG = PipelineConfig()

ADVERSARIAL = [
    "See Section 3.1 of RFC 123 and RFC 45.",
    "RFC 5, Section 3 of RFC 12, then section 9.",
    "Visit https://example.org/x. or (https://a.b/c),",
    # a url span overlapping a higher-priority sec_of_rfc match:
    # pattern-major masking must drop the URL, keep the citation
    "http://a.b/Section 3 of RFC 4",
    "",
    "Section 2 Section 2.1 of RFC 1 overlap RFC 1",
    "https://x.org/?q=1!? then Section 4",
    "no mentions here",
    "RFC 1 RFC 2 RFC 3",
    "section 1.2.3 of RFC 9999 at https://ietf.org/rfc!",
    "RFC",
    "section of RFC 1",
    "https://",
    "sectionless RFC 77 text",
    "Section 1 of RFC 2 Section 3 of RFC 4",
]


def _random_texts(n=60, seed=7):
    rng = random.Random(seed)
    atoms = [
        "RFC {}".format,
        "section {} of RFC {}".format(3, 9).__str__,
        lambda *_: "Section {}.{} of RFC {}".format(
            rng.randint(0, 20), rng.randint(0, 9), rng.randint(1, 9999)
        ),
        lambda *_: "section {}".format(rng.randint(0, 99)),
        lambda *_: "https://h{}.org/p{}{}".format(
            rng.randint(0, 9), rng.randint(0, 99), rng.choice(["", ".", ",", ")", "!?"])
        ),
        lambda *_: rng.choice(["lorem", "ipsum", "(", ")", ",", "RFC", "see"]),
    ]
    out = []
    for _ in range(n):
        words = []
        for _ in range(rng.randint(0, 14)):
            a = rng.choice(atoms)
            words.append(a(rng.randint(1, 9999)) if a is atoms[0] else a())
        out.append(" ".join(words))
    return out


def _rows(df):
    return sorted(
        (
            r["url"],
            r["frag_id"],
            r["pattern"],
            r["mention_text"],
            tuple(sorted((r["captured"] or {}).items())),
            r["start"],
            r["end"],
        )
        for r in df.collect()
    )


def test_jvm_scan_equals_python_on_corpus(spark):
    segments = segment_sections(
        extract_docs(synth_pages(spark, n_docs=40, seed=42))
    ).persist()
    jvm = _rows(detect_mentions(segments, engine="jvm"))
    py = _rows(detect_mentions(segments, engine="python"))
    assert jvm == py
    assert len(jvm) > 0
    segments.unpersist()


def test_jvm_scan_equals_python_adversarial(spark):
    texts = ADVERSARIAL + _random_texts()
    seg = spark.createDataFrame(
        [(f"u{i}", f"d{i}", f"f{i}", t) for i, t in enumerate(texts)],
        "url string, docid string, frag_id string, text string",
    )
    jvm = _rows(detect_mentions(seg, engine="jvm"))
    py = _rows(detect_mentions(seg, engine="python"))
    assert jvm == py


def test_jvm_scan_null_text(spark):
    seg = spark.createDataFrame(
        [("u0", "d0", "f0", None), ("u1", "d1", "f1", "RFC 7")],
        "url string, docid string, frag_id string, text string",
    )
    got = _rows(detect_mentions(seg, engine="jvm"))
    assert [g[3] for g in got] == ["RFC 7"]


def test_jvm_scan_plan_has_no_python_stage(spark):
    seg = spark.createDataFrame(
        [("u", "d", "f", "RFC 7")],
        "url string, docid string, frag_id string, text string",
    )
    plan = (
        detect_mentions(seg, engine="jvm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
