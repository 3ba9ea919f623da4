"""Extract + segment against the deterministic fixture corpus.

Mirrors the reference's golden strategy (testutil.py:853-926): the
DocSpec is the golden source; the pipeline must recover text
byte-identically (BASELINE.json per-row invariant) and the section
tree exactly (FSM fixtures, test/files/fsmparser)."""

import hashlib

from ferenda_spark.config import PipelineConfig
from ferenda_spark.datagen import (
    MONTH_NUM,
    GAZETTEER,
    expected_sections_rows,
    make_doc_spec,
    render_html,
    render_text,
)
from ferenda_spark.functions.fsm import segment_document
from ferenda_spark.operators.extract import extract_docs, extract_one
from ferenda_spark.operators.segment import segment_sections
from ferenda_spark.sources.pages import synth_pages

N = 40
SEED = 42
CFG = PipelineConfig()


def test_extract_byte_identical_pure():
    for i in range(N):
        spec = make_doc_spec(SEED, i, N, CFG)
        text = render_text(spec)
        got, title, lang = extract_one(render_html(spec, text))
        assert got == text, f"doc {i} text not byte-identical"
        assert title == spec.title
        assert lang == spec.lang


def test_segment_pure():
    for i in range(N):
        spec = make_doc_spec(SEED, i, N, CFG)
        meta, sections = segment_document(render_text(spec))
        assert meta["docid"] == str(spec.rfc_num)
        assert meta["title"] == spec.title
        assert meta["publisher_name"] == spec.publisher_name_used
        assert meta["issued"] == f"{spec.year}-{MONTH_NUM[spec.month]:02d}"
        want = list(expected_sections_rows(spec))
        assert [(s["ordinal"], s["title"]) for s in sections] == [
            (w["ordinal"], w["title"]) for w in want
        ]
        assert [s["parent"] for s in sections] == [w["parent"] for w in want]


def test_extract_segment_spark(spark):
    pages = synth_pages(spark, N, SEED, CFG, partitions=4)
    docs = extract_docs(pages)
    rows = {r["url"]: r for r in docs.collect()}
    assert len(rows) == N
    for i in range(N):
        spec = make_doc_spec(SEED, i, N, CFG)
        text = render_text(spec)
        r = rows[spec.url]
        assert r["extracted_text"] == text
        assert r["text_sha256"] == hashlib.sha256(text.encode()).hexdigest()
        assert r["lang"] == spec.lang

    segs = segment_sections(docs)
    seg_rows = segs.collect()
    doc_rows = [r for r in seg_rows if r["kind"] == "doc"]
    assert len(doc_rows) == N
    spec0 = make_doc_spec(SEED, 0, N, CFG)
    s0 = sorted(
        (r for r in seg_rows if r["kind"] == "section" and r["url"] == spec0.url),
        key=lambda r: r["pos"],
    )
    assert [r["ordinal"] for r in s0] == [s.ordinal for s in spec0.sections]
    d0 = next(r for r in doc_rows if r["url"] == spec0.url)
    assert d0["meta"]["publisher_name"] == spec0.publisher_name_used
    assert d0["meta"]["docid"] == str(spec0.rfc_num)
    assert GAZETTEER[spec0.publisher_idx]  # sanity: publisher index valid


# ----------------------- grammar #2: statute (C6 pluggability proof)

STATUTE_TEXT = """Lag (1998:204) om personuppgifter

1 kap. Allmänna bestämmelser

1 § Syftet med denna lag är att skydda människor.

2 § I denna lag används följande beteckningar.

Detta stycke hör till 2 §.

2 kap. Behandling av personuppgifter

1 § Personuppgifter får behandlas bara om det är lagligt.
Andra raden av samma paragraf.
"""


def test_statute_grammar_golden_sections():
    """Second registered grammar, ZERO engine changes: the generic
    fold (functions/fsm.segment_document) drives grammar-supplied
    handlers; only data differs from the RFC family (reference
    precedent: rfc.py:400-425 vs the SFS statute grammar)."""
    from ferenda_spark.functions.fsm import GRAMMARS, segment_document

    meta, sections = segment_document(STATUTE_TEXT, GRAMMARS["statute"])
    assert meta["title"] == "Lag (1998:204) om personuppgifter"
    assert meta["docid"] == "1998:204"
    got = [(s["ordinal"], s["parent"], s["title"], s["text"]) for s in sections]
    assert got == [
        ("1", "", "Allmänna bestämmelser", ""),
        ("1.1", "1", "1 §", "Syftet med denna lag är att skydda människor."),
        (
            "1.2",
            "1",
            "2 §",
            "I denna lag används följande beteckningar. "
            "Detta stycke hör till 2 §.",
        ),
        ("2", "", "Behandling av personuppgifter", ""),
        (
            "2.1",
            "2",
            "1 §",
            "Personuppgifter får behandlas bara om det är lagligt. "
            "Andra raden av samma paragraf.",
        ),
    ]
    # positions are the document order
    assert [s["pos"] for s in sections] == list(range(5))


def test_statute_grammar_through_operator(spark):
    """The grammar name flows through the mapInPandas operator."""
    from ferenda_spark.operators.segment import segment_sections

    docs = spark.createDataFrame(
        [("u:1", "sv", STATUTE_TEXT)], "url string, lang string, extracted_text string"
    )
    rows = segment_sections(docs, grammar="statute").collect()
    secs = sorted(
        (r.frag_id, r.parent_frag, r.title)
        for r in rows
        if r.kind == "section"
    )
    assert ("S1.1", "S1", "1 §") in secs and ("S2", "", "Behandling av personuppgifter") in secs
    doc = [r for r in rows if r.kind == "doc"][0]
    assert doc.title == "Lag (1998:204) om personuppgifter"
