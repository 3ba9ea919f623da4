"""Table-driven finite-state-machine document segmenter.

Reference semantics: ferenda's FSMParser (fsmparser.py:13-239) runs
recognizer predicates in priority order over a peekable chunk stream
and consults a transition table (state, recognizer) -> (constructor,
newstate), keeping a state stack for nesting.

This engine keeps the *table-driven* contract — a grammar is pure
data: ordered recognizers + a transition map — but emits flat
events instead of a nested element tree (relational output joins and
shuffles better than nested structs; SURVEY.md §1.1). Nesting is
recoverable from ordinals/parent links. The FSM is sequential per
document and embarrassingly parallel across documents, exactly the
reference's parallelism granularity (manager.py:1092-1125).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class Grammar:
    """recognizers: ordered (name, predicate) — first match wins
    (priority order matters, fsmparser.py:134-149).
    transitions: (state, recognizer_name) -> new_state; missing key
    means 'stay'. emit: recognizer_name -> event kind or None.
    handlers: event kind -> callable(chunk, state, ctx) folding the
    event into ctx (ctx carries 'meta', 'sections', 'cur', 'pos' and
    whatever grammar-private keys the handlers use) — the FOLD is
    grammar data too, so a new document family (reference precedent:
    the RFC grammar of sources/tech/rfc.py:400-425 vs the SFS
    statute grammar) plugs in with zero engine changes.
    finalize: optional callable(ctx) run after the last event."""

    recognizers: tuple
    transitions: dict
    emit: dict
    initial: str = "start"
    handlers: dict = None
    finalize: Callable | None = None


def run_fsm(grammar: Grammar, chunks: list[str]):
    """Yield (event_kind, state, chunk) for chunks whose recognizer
    has an emit kind; advance state per the transition table."""
    state = grammar.initial
    for chunk in chunks:
        name = None
        for rname, pred in grammar.recognizers:
            if pred(chunk, state):
                name = rname
                break
        if name is None:
            continue
        kind = grammar.emit.get(name)
        if kind is not None:
            yield kind, state, chunk
        state = grammar.transitions.get((state, name), state)


# ------------------------------------------------------- RFC-like grammar

RE_SECTION = re.compile(r"^(\d+(?:\.\d+)*)\.?\s+(\S.*)$")
RE_HEADER_LEFT = re.compile(r"^Request for Comments:\s*(\d+)", re.MULTILINE)
RE_TWOCOL = re.compile(r"\S\s{2,}\S")


def _is_header(chunk: str, state: str) -> bool:
    return state == "start" and "Request for Comments:" in chunk


def _is_title(chunk: str, state: str) -> bool:
    first = chunk.split("\n", 1)[0]
    return state == "header" and first.startswith(" ") and bool(first.strip())


def _is_abstract_head(chunk: str, state: str) -> bool:
    return chunk.strip() == "Abstract"


def _is_section_head(chunk: str, state: str) -> bool:
    lines = chunk.split("\n")
    return bool(RE_SECTION.match(lines[0])) and not lines[0].startswith(" ")


def _is_paragraph(chunk: str, state: str) -> bool:
    return chunk.startswith("   ")


RFC_GRAMMAR = Grammar(
    recognizers=(
        ("header", _is_header),
        ("section_head", _is_section_head),
        ("abstract_head", _is_abstract_head),
        ("title", _is_title),
        ("paragraph", _is_paragraph),
    ),
    transitions={
        ("start", "header"): "header",
        ("header", "title"): "preamble",
        ("preamble", "abstract_head"): "abstract",
        ("header", "abstract_head"): "abstract",
        ("abstract", "section_head"): "body",
        ("preamble", "section_head"): "body",
        ("header", "section_head"): "body",
        ("start", "section_head"): "body",
    },
    emit={
        "header": "header",
        "title": "title",
        "section_head": "section",
        "paragraph": "paragraph",
    },
)


def split_chunks(text: str) -> list[str]:
    """Paragraph chunking à la TextReader.readparagraph
    (textreader.py:159-173): split on blank lines, drop empties."""
    return [c for c in re.split(r"\n\s*\n", text) if c.strip()]


def parse_header_block(chunk: str) -> dict:
    """Two-column RFC header -> fields. Right column of the
    'Request for Comments' line is the publisher organization; right
    column of the 'Category' line is 'Month Year' (rfc.py:456-518
    parses the same layout into dcterms terms)."""
    out: dict[str, str] = {}
    for line in chunk.split("\n"):
        m = re.match(r"^(.*?)\s{2,}(\S.*)$", line)
        left, right = (m.group(1), m.group(2)) if m else (line, "")
        left = left.strip()
        if left.startswith("Request for Comments:"):
            m2 = re.search(r"\d+", left)
            out["docid"] = m2.group(0) if m2 else left.split(":", 1)[1].strip()
            out["publisher_name"] = right.strip()
        elif left.startswith("Category:"):
            out["category"] = left.split(":", 1)[1].strip()
            out["issued_raw"] = right.strip()
        elif right and "author" not in out:
            out["author"] = right.strip()
    return out


_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December",
        ]
    )
}


def issued_to_gym(raw: str) -> str:
    """'May 2013' -> '2013-05' (xsd:gYearMonth lexical form, matching
    the reference's custom RFC date converter, rfc.py:622-640)."""
    parts = raw.split()
    if len(parts) == 2 and parts[0] in _MONTHS:
        return f"{int(parts[1]):04d}-{_MONTHS[parts[0]]:02d}"
    return ""


# ----------------------------------------------- RFC grammar handlers


def _rfc_on_header(chunk, state, ctx):
    ctx["meta"].update(parse_header_block(chunk))


def _rfc_on_title(chunk, state, ctx):
    ctx["meta"]["title"] = " ".join(
        ln.strip() for ln in chunk.split("\n") if ln.strip()
    )


def _rfc_on_section(chunk, state, ctx):
    first, _, rest = chunk.partition("\n")
    m = RE_SECTION.match(first)
    ordinal, title = m.group(1), m.group(2).strip()
    cur = {
        "ordinal": ordinal,
        "parent": ordinal.rsplit(".", 1)[0] if "." in ordinal else "",
        "title": title,
        "text": rest.strip(),
        "pos": ctx["pos"],
    }
    ctx["pos"] += 1
    ctx["cur"] = cur
    ctx["sections"].append(cur)


def _rfc_on_paragraph(chunk, state, ctx):
    para = " ".join(ln.strip() for ln in chunk.split("\n"))
    cur = ctx["cur"]
    if state == "body" and cur is not None:
        cur["text"] = (cur["text"] + " " + para).strip() if cur["text"] else para
    elif state == "abstract":
        meta = ctx["meta"]
        meta["abstract"] = (meta.get("abstract", "") + " " + para).strip()


def _rfc_finalize(ctx):
    if "issued_raw" in ctx["meta"]:
        ctx["meta"]["issued"] = issued_to_gym(ctx["meta"]["issued_raw"])


RFC_HANDLERS = {
    "header": _rfc_on_header,
    "title": _rfc_on_title,
    "section": _rfc_on_section,
    "paragraph": _rfc_on_paragraph,
}

# attach the fold to the grammar (defined above, handlers below —
# rebind once at import; frozen dataclass, so via replace)
import dataclasses as _dc  # noqa: E402

RFC_GRAMMAR = _dc.replace(
    RFC_GRAMMAR, handlers=RFC_HANDLERS, finalize=_rfc_finalize
)


def segment_document(text: str, grammar: Grammar | None = None):
    """Run a grammar over one document — the generic fold: run_fsm
    events dispatch to the GRAMMAR's handlers (the engine knows
    nothing about any document family; C6's pluggability promise).

    Returns (docmeta, sections): sections are dicts with
    ordinal/parent/title/text/pos; docmeta keys are grammar-defined
    (RFC: docid/title/publisher_name/category/issued)."""
    if grammar is None:
        grammar = RFC_GRAMMAR
    handlers = grammar.handlers or {}
    ctx: dict = {"meta": {}, "sections": [], "cur": None, "pos": 0}
    for kind, state, chunk in run_fsm(grammar, split_chunks(text)):
        h = handlers.get(kind)
        if h is not None:
            h(chunk, state, ctx)
    if grammar.finalize is not None:
        grammar.finalize(ctx)
    return ctx["meta"], ctx["sections"]


# --------------------------------------- statute-like grammar (#2)
# Reference precedent: the numbered-chapter/section (kapitel/§) SFS
# statute family vs the RFC family (sources/tech/rfc.py:400-425) —
# same engine, different grammar DATA.

RE_CHAPTER = re.compile(r"^(\d+) kap\.\s+(\S.*)$")
RE_PARA_SIGN = re.compile(r"^(\d+) §\s*(.*)$", re.DOTALL)


def _is_act_title(chunk: str, state: str) -> bool:
    return state == "start" and bool(chunk.strip())


def _is_chapter(chunk: str, state: str) -> bool:
    return bool(RE_CHAPTER.match(chunk.split("\n", 1)[0]))


def _is_parasign(chunk: str, state: str) -> bool:
    return bool(RE_PARA_SIGN.match(chunk.split("\n", 1)[0]))


def _is_body_text(chunk: str, state: str) -> bool:
    return state in ("chapter", "body") and bool(chunk.strip())


def _st_on_title(chunk, state, ctx):
    first = chunk.split("\n", 1)[0].strip()
    ctx["meta"]["title"] = first
    m = re.search(r"\((\d{4}:\d+)\)", first)
    if m:
        ctx["meta"]["docid"] = m.group(1)


def _st_on_chapter(chunk, state, ctx):
    first, _, rest = chunk.partition("\n")
    m = RE_CHAPTER.match(first)
    ctx["chapter"] = m.group(1)
    cur = {
        "ordinal": m.group(1),
        "parent": "",
        "title": m.group(2).strip(),
        "text": rest.strip(),
        "pos": ctx["pos"],
    }
    ctx["pos"] += 1
    ctx["cur"] = cur
    ctx["sections"].append(cur)


def _st_on_section(chunk, state, ctx):
    m = RE_PARA_SIGN.match(chunk)
    n = m.group(1)
    ch = ctx.get("chapter", "")
    cur = {
        "ordinal": f"{ch}.{n}" if ch else n,
        "parent": ch,
        "title": f"{n} §",
        "text": " ".join(
            ln.strip() for ln in m.group(2).split("\n") if ln.strip()
        ),
        "pos": ctx["pos"],
    }
    ctx["pos"] += 1
    ctx["cur"] = cur
    ctx["sections"].append(cur)


def _st_on_paragraph(chunk, state, ctx):
    para = " ".join(ln.strip() for ln in chunk.split("\n"))
    cur = ctx["cur"]
    if cur is not None:
        cur["text"] = (cur["text"] + " " + para).strip() if cur["text"] else para


STATUTE_GRAMMAR = Grammar(
    recognizers=(
        ("chapter", _is_chapter),
        ("parasign", _is_parasign),
        ("act_title", _is_act_title),
        ("body_text", _is_body_text),
    ),
    transitions={
        ("start", "act_title"): "preamble",
        ("start", "chapter"): "chapter",
        ("preamble", "chapter"): "chapter",
        ("chapter", "parasign"): "body",
        ("preamble", "parasign"): "body",
        ("start", "parasign"): "body",
        ("body", "chapter"): "chapter",
    },
    emit={
        "act_title": "title",
        "chapter": "chapter",
        "parasign": "section",
        "body_text": "paragraph",
    },
    handlers={
        "title": _st_on_title,
        "chapter": _st_on_chapter,
        "section": _st_on_section,
        "paragraph": _st_on_paragraph,
    },
)

#: name -> Grammar: executors resolve grammars by name so operator
#: parameters stay plain strings (segment.segment_sections(grammar=))
GRAMMARS: dict[str, Grammar] = {
    "rfc": RFC_GRAMMAR,
    "statute": STATUTE_GRAMMAR,
}
