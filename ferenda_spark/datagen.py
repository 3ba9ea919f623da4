"""Deterministic synthetic Common-Crawl-style pages + golden triples.

Mirrors the reference's golden-fixture strategy
(/root/reference/test/files/repo/rfc/{downloaded,distilled} driven by
testutil.py:853-926): every fixture document exists twice — as raw
input and as the expected (subj, pred, obj) set. Here both views are
derived from one structured ``DocSpec``, so the expected triples are
computed independently of the pipeline (the pipeline must *recover*
the structure from raw text/html).

Document shape follows the reference RFC corpus
(/root/reference/ferenda/sources/tech/rfc.py:134-428 grammar;
header parse :456-518): a 3-line two-column header, a centered title,
an Abstract, then numbered sections "1."/"1.1"/"1.1.1" with indented
paragraphs carrying citations (citationpatterns.py:16-70 URL grammar
with trailing-punctuation exclusion; rfc.py:430-452 RFC/section
references).

Per-doc generation is a pure function of (seed, i, n_docs) so it can
run *distributed* inside mapInPandas at bench scale — no driver-side
corpus materialization.
"""

from __future__ import annotations

import hashlib
import html as _html
import random
from dataclasses import dataclass, field
from datetime import datetime, timezone

from ferenda_spark.config import (
    BIBO,
    DCT,
    NS,
    OWL_SAMEAS,
    PROV_GENERATED_BY,
    RDF_TYPE,
    PipelineConfig,
)

WORDS = (
    "network protocol transport routing datagram segment window state "
    "header payload option flag congestion control retransmission timer "
    "gateway address prefix label binding registry namespace identifier "
    "schema encoding compression integrity checksum security privacy "
    "policy framework architecture deployment operation management"
).split()

TITLE_WORDS = (
    "Adaptive Extended Minimal Robust Scalable Secure Unified Virtual "
    "Dynamic Generic Modular Portable Reliable Flexible Incremental"
).split()

CATEGORIES = ["Informational", "Standards Track", "Experimental", "Best Current Practice"]

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTH_NUM = {m: i + 1 for i, m in enumerate(MONTHS)}

# Gazetteer of publisher organizations. Each has a canonical URI and
# 1-3 equivalent URIs (multi-template minting per coin.py:43-47 /
# dv.py:1466 duplicate-URI reconciliation) — the canonicalization pass
# must collapse these.  alt_labels exercise the exact path; the
# generator also misspells labels to exercise the fuzzy path
# (documentrepository.py:528-575, cutoff 0.8).
GAZETTEER = [
    # (slug, label, alt_labels)
    ("ietf", "Internet Engineering Task Force", ["IETF Secretariat"]),
    ("iab", "Internet Architecture Board", ["Architecture Board"]),
    ("w3c", "World Wide Web Consortium", ["W3 Consortium"]),
    ("iso", "International Standards Organization", ["ISO Committee"]),
    ("ecma", "European Computer Manufacturers Association", ["ECMA International"]),
    ("oasis", "Organization for Structured Information Standards", ["OASIS Open"]),
    ("itu", "International Telecommunication Union", ["Telecom Union"]),
    ("ansi", "American National Standards Institute", ["ANSI Institute"]),
]

AUTHORS = ["A. Larsson", "B. Okafor", "C. Duval", "D. Marini", "E. Svensson", "F. Tanaka"]


def _doc_rng(seed: int, i: int) -> random.Random:
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    return random.Random(int(h[:16], 16))


@dataclass
class SectionSpec:
    ordinal: str          # "1", "1.1", "1.1.1"
    title: str
    paragraphs: list = field(default_factory=list)  # list[str]


@dataclass
class DocSpec:
    i: int
    rfc_num: int
    url: str
    host: str
    lang: str
    title: str
    author: str
    category: str
    publisher_idx: int
    publisher_name_used: str   # possibly misspelled
    month: str
    year: int
    warc_ts: datetime
    sections: list = field(default_factory=list)   # list[SectionSpec]
    abstract: str = ""
    # (frag_ordinal|"" for doc-level, obj_uri_or_url, obj_is_uri)
    citations: list = field(default_factory=list)


def entity_uris(base_uri: str, label: str) -> list[str]:
    """All URIs minted for one gazetteer entity (template priority
    order) — the spec-level contract shared with the minting stage."""
    from ferenda_spark.functions.slug import slugify

    slug = slugify(label)
    return [f"{base_uri}/ext/{slug}", f"{base_uri}/org/{slug}"]


def entity_canon_uri(base_uri: str, label: str) -> str:
    """Canonical = lexicographic min of the equivalence class (the
    connected-components pass labels each component by min member)."""
    return min(entity_uris(base_uri, label))


def _misspell(rng: random.Random, name: str) -> str:
    """Swap two adjacent letters inside one word — stays above the
    0.8 difflib-style similarity cutoff for these long labels."""
    idx = rng.randrange(2, len(name) - 2)
    if name[idx] == " " or name[idx + 1] == " ":
        idx += 2
    s = list(name)
    s[idx], s[idx + 1] = s[idx + 1], s[idx]
    return "".join(s)


def make_doc_spec(seed: int, i: int, n_docs: int, cfg: PipelineConfig | None = None) -> DocSpec:
    cfg = cfg or PipelineConfig()
    rng = _doc_rng(seed, i)
    rfc_num = 1000 + i
    n_hosts = max(4, n_docs // 50)
    # Zipf-ish host skew: cube of uniform → hot host-0
    host_idx = int(n_hosts * (rng.random() ** 3))
    host = f"host-{host_idx}.example.org"
    url = f"https://{host}/rfc/{rfc_num}"
    lang = "sv" if rng.random() < 0.08 else "en"
    title = " ".join(
        [rng.choice(TITLE_WORDS)]
        + [rng.choice(WORDS).capitalize() for _ in range(rng.randint(2, 4))]
    )
    year = 1990 + (i % 35)
    month = MONTHS[rng.randrange(12)]
    pub_idx = rng.randrange(len(GAZETTEER))
    pub_label = GAZETTEER[pub_idx][1]
    if rng.random() < 0.25:
        pub_name = GAZETTEER[pub_idx][2][rng.randrange(len(GAZETTEER[pub_idx][2]))]
    elif rng.random() < 0.20:
        pub_name = _misspell(rng, pub_label)
    else:
        pub_name = pub_label
    warc_ts = datetime(year, MONTH_NUM[month], 1 + (i % 27), i % 24, i % 60, tzinfo=timezone.utc)

    spec = DocSpec(
        i=i, rfc_num=rfc_num, url=url, host=host, lang=lang, title=title,
        author=AUTHORS[rng.randrange(len(AUTHORS))],
        category=CATEGORIES[rng.randrange(len(CATEGORIES))],
        publisher_idx=pub_idx, publisher_name_used=pub_name,
        month=month, year=year, warc_ts=warc_ts,
    )
    spec.abstract = _sentences(rng, 2)

    # section tree: 2-5 top sections, some with subsections (depth<=3)
    ordinals: list[str] = []
    for s in range(1, rng.randint(3, 6)):
        ordinals.append(str(s))
        if rng.random() < 0.6:
            for ss in range(1, rng.randint(2, 4)):
                ordinals.append(f"{s}.{ss}")
                if rng.random() < 0.25:
                    ordinals.append(f"{s}.{ss}.1")

    base = cfg.base_uri
    doc_uri = f"{base}/res/{cfg.alias}/{rfc_num}"

    for ordinal in ordinals:
        stitle = " ".join(rng.choice(WORDS).capitalize() for _ in range(rng.randint(1, 3)))
        paras = []
        for _p in range(rng.randint(1, 2)):
            text = _sentences(rng, rng.randint(1, 3))
            # inject citations deterministically
            roll = rng.random()
            if roll < 0.30 and n_docs > 1:
                m = 1000 + ((i * 7 + len(paras) + int(ordinal[0])) % n_docs)
                if m != rfc_num:
                    text += f" This extends RFC {m}."
                    spec.citations.append((ordinal, f"{base}/res/{cfg.alias}/{m}", True))
            elif roll < 0.45 and n_docs > 1:
                m = 1000 + ((i * 11 + int(ordinal[0])) % n_docs)
                tgt_ord = f"{1 + (i % 3)}"
                if m != rfc_num:
                    text += f" As defined in section {tgt_ord} of RFC {m}, the rules apply."
                    spec.citations.append(
                        (ordinal, f"{base}/res/{cfg.alias}/{m}#S{tgt_ord}", True)
                    )
            elif roll < 0.55 and ordinal != ordinals[0]:
                tgt = ordinals[rng.randrange(len(ordinals))]
                if tgt != ordinal:
                    text += f" Compare section {tgt} above."
                    spec.citations.append((ordinal, f"{doc_uri}#S{tgt}", True))
            elif roll < 0.65:
                m = 1000 + ((i * 13 + 1) % max(n_docs, 1))
                ext_url = f"https://host-{(i + 3) % n_hosts}.example.org/rfc/{m}"
                trap = rng.choice([f"(see {ext_url})", f"More at {ext_url}.", f"See {ext_url}, too."])
                text += " " + trap
                spec.citations.append((ordinal, ext_url, True))
            paras.append(text)
        spec.sections.append(SectionSpec(ordinal=ordinal, title=stitle, paragraphs=paras))
    return spec


def _sentences(rng: random.Random, n: int) -> str:
    out = []
    for _ in range(n):
        k = rng.randint(6, 14)
        ws = [rng.choice(WORDS) for _ in range(k)]
        out.append(ws[0].capitalize() + " " + " ".join(ws[1:]) + ".")
    return " ".join(out)


# ---------------------------------------------------------------- rendering

def render_text(spec: DocSpec) -> str:
    """RFC-like plain text. Layout is the contract the extractor+FSM
    must parse back (two-column header, centered title, 3-space
    indented body paragraphs, 'N.' section heads)."""

    def two_col(left: str, right: str) -> str:
        pad = max(2, 72 - len(left) - len(right))
        return left + " " * pad + right

    lines = [
        two_col("Network Working Group", spec.author),
        two_col(f"Request for Comments: {spec.rfc_num}", spec.publisher_name_used),
        two_col(f"Category: {spec.category}", f"{spec.month} {spec.year}"),
        "",
        "",
        spec.title.center(72).rstrip(),
        "",
        "Abstract",
        "",
    ]
    lines.extend("   " + ln for ln in _wrap(spec.abstract))
    lines.append("")
    for sec in spec.sections:
        lines.append(f"{sec.ordinal}. {sec.title}")
        lines.append("")
        for para in sec.paragraphs:
            lines.extend("   " + ln for ln in _wrap(para))
            lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def _wrap(text: str, width: int = 69) -> list[str]:
    words = text.split()
    lines, cur = [], ""
    for w in words:
        if cur and len(cur) + 1 + len(w) > width:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}" if cur else w
    if cur:
        lines.append(cur)
    return lines


def render_html(spec: DocSpec, text: str) -> bytes:
    """Fixed template: the extractor must select <body>, drop
    <script>/<style>, and recover the text byte-identically
    (documentrepository.py:354-363,1365-1378 content selector +
    filter; :1301 errors='replace' decode)."""
    return (
        f'<html lang="{spec.lang}"><head><meta charset="utf-8">'
        f"<title>{_html.escape(spec.title)}</title>"
        f"<style>pre{{font:monospace}}</style></head>"
        f"<body><script>var tracker = 1;</script>"
        f"<pre>{_html.escape(text)}</pre>"
        f"<script>var footer = 2;</script></body></html>"
    ).encode("utf-8")


def pages_rows(seed: int, lo: int, hi: int, n_docs: int, cfg: PipelineConfig | None = None):
    """Rows [lo, hi) of the pages table — callable per-partition."""
    cfg = cfg or PipelineConfig()
    for i in range(lo, hi):
        spec = make_doc_spec(seed, i, n_docs, cfg)
        text = render_text(spec)
        yield {
            "url": spec.url,
            "warc_ts": spec.warc_ts,
            "html": render_html(spec, text),
            "text": text,
            "lang": spec.lang,
        }


def pages_rows_v2(
    seed: int,
    seed2: int,
    lo: int,
    hi: int,
    n_docs: int,
    n_new: int,
    change_every: int,
    cfg: PipelineConfig | None = None,
):
    """Rows [lo, hi) of SNAPSHOT 2 of the pages table — a full
    recrawl of the seed-`seed` corpus (the reference recrawls every
    source and relies on needed()/DocumentEntry to skip unchanged
    downloads, documentstore.py:400-470):

    - ``i % change_every == 0`` (i < n_docs): REVISED — content
      respun from `seed2` under the SAME url (host pinned from the
      v1 spec; rfc_num = 1000+i is seed-independent, so the docid is
      stable and the revision replaces the old doc in place),
      warc_ts advanced one day past the v1 crawl
    - other ``i < n_docs``: byte-identical recrawl of the v1 page
    - ``i >= n_docs`` (up to n_docs+n_new): brand-new docs from
      `seed2`
    """
    cfg = cfg or PipelineConfig()
    for i in range(lo, hi):
        if i < n_docs and i % change_every != 0:
            yield from pages_rows(seed, i, i + 1, n_docs, cfg)
            continue
        if i < n_docs:
            v1 = make_doc_spec(seed, i, n_docs, cfg)
            spec = make_doc_spec(seed2, i, n_docs, cfg)
            spec.url, spec.host = v1.url, v1.host
            spec.warc_ts = datetime.fromtimestamp(
                v1.warc_ts.timestamp() + 86400, tz=timezone.utc
            )
        else:
            spec = make_doc_spec(seed2, i, n_docs + n_new, cfg)
        text = render_text(spec)
        yield {
            "url": spec.url,
            "warc_ts": spec.warc_ts,
            "html": render_html(spec, text),
            "text": text,
            "lang": spec.lang,
        }


# ---------------------------------------------------------------- golden

def expected_doc_triples(spec: DocSpec, cfg: PipelineConfig | None = None):
    """The golden (subj, pred, obj, obj_is_uri) set for one doc,
    derived from the spec — NOT from the pipeline.  Vocabulary matches
    the reference distilled fixtures (test/files/repo/rfc/*.ttl;
    emission sites documentrepository.py:1305-1345,
    elements/elements.py:611-665, rfc.py:483-644)."""
    cfg = cfg or PipelineConfig()
    base = cfg.base_uri
    doc_uri = f"{base}/res/{cfg.alias}/{spec.rfc_num}"
    pub_label = GAZETTEER[spec.publisher_idx][1]
    t = [
        (doc_uri, RDF_TYPE, NS["rfc"] + "RFC", True),
        (doc_uri, DCT + "title", spec.title, False),
        (doc_uri, DCT + "identifier", f"RFC {spec.rfc_num}", False),
        (doc_uri, DCT + "issued", f"{spec.year}-{MONTH_NUM[spec.month]:02d}", False),
        (doc_uri, DCT + "publisher", entity_canon_uri(base, pub_label), True),
        (doc_uri, PROV_GENERATED_BY, cfg.pipeline_id, False),
    ]
    for sec in spec.sections:
        s_uri = f"{doc_uri}#S{sec.ordinal}"
        parent = (
            doc_uri
            if "." not in sec.ordinal
            else f"{doc_uri}#S{sec.ordinal.rsplit('.', 1)[0]}"
        )
        t += [
            (s_uri, RDF_TYPE, BIBO + "DocumentPart", True),
            (s_uri, DCT + "title", sec.title, False),
            (s_uri, BIBO + "chapter", sec.ordinal, False),
            (s_uri, DCT + "identifier", f"RFC {spec.rfc_num}, section {sec.ordinal}", False),
            (s_uri, DCT + "isPartOf", parent, True),
        ]
    for frag, obj, obj_is_uri in spec.citations:
        subj = doc_uri if frag == "" else f"{doc_uri}#S{frag}"
        t.append((subj, DCT + "references", obj, obj_is_uri))
    return t


def expected_sections_rows(spec: DocSpec):
    for pos, sec in enumerate(spec.sections):
        parent = "" if "." not in sec.ordinal else sec.ordinal.rsplit(".", 1)[0]
        yield {
            "url": spec.url,
            "ordinal": sec.ordinal,
            "parent": parent,
            "title": sec.title,
            "pos": pos,
        }


def gazetteer_rows(cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    for slug, label, alts in GAZETTEER:
        uris = entity_uris(cfg.base_uri, label)
        yield {
            "slug": slug,
            "label": label,
            "alt_labels": alts,
            "uris": uris,
            "canon_uri": min(uris),
        }


def sameas_edge_rows(cfg: PipelineConfig | None = None, big_component: int = 0):
    """owl:sameAs edges among entity URIs; optionally one huge chain
    component (FIXTURES.md §4) to exercise CC salting/convergence."""
    cfg = cfg or PipelineConfig()
    for g in gazetteer_rows(cfg):
        us = g["uris"]
        for a, b in zip(us, us[1:]):
            yield {"src": a, "dst": b}
    for k in range(big_component):
        yield {
            "src": f"{cfg.base_uri}/big/{k}",
            "dst": f"{cfg.base_uri}/big/{k + 1}",
        }
