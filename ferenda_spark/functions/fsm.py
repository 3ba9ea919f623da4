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
    means 'stay'. emit: recognizer_name -> event kind or None."""

    recognizers: tuple
    transitions: dict
    emit: dict
    initial: str = "start"


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


def segment_document(text: str) -> tuple[dict, list[dict]]:
    """Run the RFC grammar over one document.

    Returns (docmeta, sections): docmeta has docid/title/publisher_name/
    category/issued; sections are dicts with ordinal/parent/title/text/pos.
    """
    meta: dict[str, str] = {}
    sections: list[dict] = []
    cur: dict | None = None
    pos = 0
    for kind, state, chunk in run_fsm(RFC_GRAMMAR, split_chunks(text)):
        if kind == "header":
            meta.update(parse_header_block(chunk))
        elif kind == "title":
            meta["title"] = " ".join(
                ln.strip() for ln in chunk.split("\n") if ln.strip()
            )
        elif kind == "section":
            first, _, rest = chunk.partition("\n")
            m = RE_SECTION.match(first)
            ordinal, title = m.group(1), m.group(2).strip()
            cur = {
                "ordinal": ordinal,
                "parent": ordinal.rsplit(".", 1)[0] if "." in ordinal else "",
                "title": title,
                "text": rest.strip(),
                "pos": pos,
            }
            pos += 1
            sections.append(cur)
        elif kind == "paragraph":
            para = " ".join(ln.strip() for ln in chunk.split("\n"))
            if state == "body" and cur is not None:
                cur["text"] = (cur["text"] + " " + para).strip() if cur["text"] else para
            elif state == "abstract":
                meta["abstract"] = (meta.get("abstract", "") + " " + para).strip()
    if "issued_raw" in meta:
        meta["issued"] = issued_to_gym(meta["issued_raw"])
    return meta, sections
