"""Extract stage: pages -> docs (deterministic HTML -> text).

Reference semantics (documentrepository.py):
- decode bytes with errors='replace'            (:1301)
- select the content root (default "body")      (:354-358, 1365-1372)
- drop filtered subtrees (script; we add style)  (:359-363, 1373-1378)
- text is the concatenation of remaining text nodes, entities
  unescaped, **no whitespace normalization** — the per-row invariant
  is byte-identical extracted text per url (BASELINE.json input_hint).

Implementation is a stdlib ``html.parser`` walk (pure Python, zero
version drift) inside ``mapInPandas`` — Arrow-batched, one pass over
the binary column, embarrassingly parallel across pages.
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def strip_faux_bold(col: Column) -> Column:
    """P4 faux-bold strip (rfc.py:461-467): some plaintext sources
    embolden by overstriking — a char, backspace (\\x08), then the
    char again.  ``re.sub('.\\b', '', text)`` removes every
    char+backspace pair, leaving the final glyph; this is the same
    regex as a column expression (parse-time preprocessing, applied
    before segmentation)."""
    return F.regexp_replace(col, ".\x08", "")

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("html_title", T.StringType(), True),
        T.StructField("html_lang", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("text_sha256", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_SKIP_TAGS = frozenset({"script", "style"})


class _BodyTextExtractor(HTMLParser):
    """Collect text nodes under <body>, excluding script/style, plus
    <title> and the root lang attribute. convert_charrefs=True makes
    the parser hand us entity-decoded text."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.in_body = False
        self.in_title = False
        self.skip_depth = 0
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.html_lang: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "html" and self.html_lang is None:
            for k, v in attrs:
                if k == "lang":
                    self.html_lang = v
        if tag == "body":
            self.in_body = True
        elif tag == "title":
            self.in_title = True
        elif tag in _SKIP_TAGS:
            self.skip_depth += 1

    def handle_endtag(self, tag):
        if tag == "body":
            self.in_body = False
        elif tag == "title":
            self.in_title = False
        elif tag in _SKIP_TAGS and self.skip_depth > 0:
            self.skip_depth -= 1

    def handle_data(self, data):
        if self.in_title:
            self.title_parts.append(data)
        elif self.in_body and self.skip_depth == 0:
            self.parts.append(data)


def extract_one(html_bytes: bytes) -> tuple[str, str, str]:
    """(extracted_text, html_title, html_lang) for one page."""
    text = html_bytes.decode("utf-8", errors="replace")
    p = _BodyTextExtractor()
    p.feed(text)
    p.close()
    return "".join(p.parts), "".join(p.title_parts), p.html_lang or ""


def extract_docs(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> docs."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            texts, titles, langs, shas, lens = [], [], [], [], []
            for raw in pdf["html"]:
                t, title, hlang = extract_one(bytes(raw) if raw is not None else b"")
                texts.append(t)
                titles.append(title)
                langs.append(hlang)
                shas.append(hashlib.sha256(t.encode("utf-8")).hexdigest())
                lens.append(len(t))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": [h or l for h, l in zip(langs, pdf["lang"])],
                    "html_title": titles,
                    "html_lang": langs,
                    "extracted_text": texts,
                    "text_sha256": shas,
                    "n_chars": lens,
                }
            )

    return pages.mapInPandas(run, schema=DOCS_SCHEMA)
