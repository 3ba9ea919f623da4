"""XHTML+RDFa render + distill — T3 as real computation.

Reference parity: the reference serializes each document's metadata
graph into the XHTML `<head>` as RDFa — `<title property>`,
`<meta property content>`, `<link rel href>`, with `about`
scoping for sub-resources (documentrepository.render_xhtml_tree,
/root/reference/ferenda/documentrepository.py:1522-1708) — and the
`render` decorator then re-parses that XHTML as RDFa into the
*distilled* graph (decorators.py:201-227), asserting render→distill
graph equality as its self-check (decorators.py:237-259,
assertEqualGraphs semantics).  SURVEY.md T3 originally kept only the
set-equality *contract*; this module implements the computation:

- ``render_rdfa``: triples table -> one XHTML+RDFa document per
  document root.  Pure Catalyst: per-triple element strings
  (codegen'd XML escaping, CURIE compression as a constant-folded
  when-chain), ONE groupBy(doc) aggregation, wrap in
  html/head[@about].  Main-subject triples inherit the head's
  ``about``; the main subject's dcterms:title renders as a real
  ``<title>`` element, like the reference.
- ``distill_rdfa``: XHTML documents -> triples table.  One stdlib
  ElementTree walk per document inside mapInPandas (per-document
  parallelism, no shuffle), resolving CURIEs via the RDFa 1.1
  ``prefix`` attribute, honoring ``about`` scoping, xml:lang
  inheritance/reset, ``datatype``, ``rel``/``href``, ``rev``
  (inverse), and ``resource``.

Literal fidelity: XML attribute-value normalization folds raw
newline/tab/CR to spaces, so the renderer escapes them as numeric
character references (expanded AFTER normalization per XML 1.0
§3.3.3) — content="" literals round-trip byte-exactly.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.turtle import RDF_TYPE, TRIPLE_SCHEMA

_XML_NS = "http://www.w3.org/XML/1998/namespace"
_XHTML = "http://www.w3.org/1999/xhtml"
DCT_TITLE = "http://purl.org/dc/terms/title"

# ---------------------------------------------------------------------------
# Render (pure Catalyst)
# ---------------------------------------------------------------------------


def _attr_escape(col: Column) -> Column:
    """XML attribute-value escaping incl. numeric char refs for the
    whitespace that attribute-value normalization would otherwise
    destroy."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit('"'), F.lit("&quot;"))
    out = F.replace(out, F.lit("\n"), F.lit("&#10;"))
    out = F.replace(out, F.lit("\r"), F.lit("&#13;"))
    out = F.replace(out, F.lit("\t"), F.lit("&#9;"))
    return out


def _text_escape(col: Column) -> Column:
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    # raw \r in element text is folded to \n by XML line-end
    # normalization (§2.11); a char ref expands after it and survives
    return F.replace(out, F.lit("\r"), F.lit("&#13;"))


#: C0 controls other than \t\n\r can't appear in XML 1.0 at all
#: (illegal even as char refs) — fail loudly instead of emitting an
#: unparseable document
_XML_ILLEGAL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def _curie(col: Column, prefixes: dict[str, str] | None) -> Column:
    """CURIE-compress an IRI for @property/@rel/@datatype (RDFa 1.1
    allows full IRIs there too, which is the fallback)."""
    out = col
    if not prefixes:
        return out
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(ns) + 1, 2**30)
        hit = col.startswith(ns) & local.rlike("^[A-Za-z_][A-Za-z0-9_.-]*$")
        out = F.when(hit, F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    return out


def render_rdfa(
    triples: DataFrame,
    prefixes: dict[str, str] | None = None,
    doc_col: Column | None = None,
) -> DataFrame:
    """triples table -> (doc, xhtml) — one XHTML+RDFa document per
    document root (default root: subject before '#', the reference's
    doc-uri/sub-resource convention).

    Per-triple element (sorted, deterministic):
    - main-subject dcterms:title -> ``<title property="dcterms:title">``
    - literal -> ``<meta property content [datatype|xml:lang]>``
      (xml:lang="" resets inheritance for plain literals, like the
      reference's doc.lang handling)
    - IRI object -> ``<link rel href>``
    - non-main subjects carry ``about`` (RDFa subject scoping)

    Plan: codegen'd projection + ONE groupBy(doc) aggregation."""
    doc = doc_col if doc_col is not None else F.substring_index(F.col("subj"), "#", 1)
    t = triples.select(
        doc.alias("_doc"), "subj", "pred", "obj", "obj_is_uri", "lang", "datatype"
    ).dropDuplicates(["_doc", "subj", "pred", "obj", "obj_is_uri", "lang", "datatype"])
    is_main = F.col("subj") == F.col("_doc")
    about = F.when(
        is_main, F.lit("")
    ).otherwise(F.concat(F.lit(' about="'), _attr_escape(F.col("subj")), F.lit('"')))
    pred_c = _curie(F.col("pred"), prefixes)
    lang_attr = F.when(
        F.col("lang").isNotNull() & (F.col("lang") != ""),
        F.concat(F.lit(' xml:lang="'), F.col("lang"), F.lit('"')),
    ).otherwise(F.lit(' xml:lang=""'))
    dt_attr = F.when(
        F.col("datatype").isNotNull() & (F.col("datatype") != ""),
        F.concat(
            F.lit(' datatype="'),
            _attr_escape(_curie(F.col("datatype"), prefixes)),
            F.lit('"'),
        ),
    ).otherwise(lang_attr)
    title = F.concat(
        F.lit('<title property="'), _attr_escape(pred_c),
        F.when(
            F.col("lang").isNotNull() & (F.col("lang") != ""),
            F.concat(F.lit('" xml:lang="'), F.col("lang")),
        ).otherwise(F.lit('" xml:lang="')),
        F.lit('">'), _text_escape(F.col("obj")), F.lit("</title>"),
    )
    meta = F.concat(
        F.lit("<meta"), about,
        F.lit(' property="'), _attr_escape(pred_c), F.lit('"'),
        F.lit(' content="'), _attr_escape(F.col("obj")), F.lit('"'),
        dt_attr, F.lit("/>"),
    )
    link = F.concat(
        F.lit("<link"), about,
        F.lit(' rel="'), _attr_escape(pred_c), F.lit('"'),
        F.lit(' href="'), _attr_escape(F.col("obj")), F.lit('"/>'),
    )
    elem = (
        F.when(
            ~F.col("obj_is_uri") & F.col("obj").rlike(_XML_ILLEGAL),
            F.raise_error(
                F.concat(
                    F.lit("rdfa: literal contains XML-1.0-illegal "
                          "control characters (subject "),
                    F.col("subj"), F.lit(")"),
                )
            ),
        )
        .when(
            is_main
            & (F.col("pred") == DCT_TITLE)
            & ~F.col("obj_is_uri")
            # a TYPED title can't ride the <title> element (it has
            # no datatype attribute in our shape) — meta keeps it
            & F.col("datatype").isNull(),
            title,
        )
        .when(F.col("obj_is_uri"), link)
        .otherwise(meta)
    )
    prefix_attr = (
        ' prefix="' + " ".join(f"{p}: {ns}" for p, ns in sorted(prefixes.items())) + '"'
        if prefixes
        else ""
    )
    return (
        t.select("_doc", elem.alias("e"))
        .groupBy("_doc")
        .agg(F.sort_array(F.collect_list("e")).alias("es"))
        .select(
            F.col("_doc").alias("doc"),
            F.concat(
                F.lit(
                    '<html xmlns="' + _XHTML + '" version="XHTML+RDFa 1.1"'
                    + prefix_attr + ">"
                ),
                F.lit('<head about="'), _attr_escape(F.col("_doc")), F.lit('">'),
                F.concat_ws("\n", F.col("es")),
                F.lit("</head><body/></html>"),
            ).alias("xhtml"),
        )
    )


# ---------------------------------------------------------------------------
# Distill (parse RDFa, one ElementTree walk per document)
# ---------------------------------------------------------------------------

_PREFIX_DECL = re.compile(r"([A-Za-z_][\w.-]*):\s+(\S+)")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class _RdfaDoc:
    """RDFa walk over one XHTML document: title/meta/link elements
    with about scoping, CURIE-or-IRI terms, xml:lang inheritance
    (xml:lang="" resets), rel/rev/href/resource.  Strict ValueError
    on malformed XML or unresolvable CURIEs — same corrupt-input
    contract as the other parsers."""

    def __init__(self, text: str):
        import io

        try:
            self.root = ET.parse(io.StringIO(text)).getroot()
        except ET.ParseError as e:
            raise ValueError(f"rdfa: not well-formed XML: {e}") from e
        self.prefixes: dict[str, str] = {}
        decl = self.root.get("prefix")
        if decl:
            for m in _PREFIX_DECL.finditer(decl):
                self.prefixes[m.group(1)] = m.group(2)
        self.out: list[tuple] = []

    def _expand(self, term: str) -> str:
        """CURIE -> IRI; full IRIs (contain '://' or no declared
        prefix match with a scheme-like shape) pass through."""
        if ":" in term:
            pfx = term.split(":", 1)[0]
            if pfx in self.prefixes:
                return self.prefixes[pfx] + term.split(":", 1)[1]
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", term):
            return term  # already an IRI
        raise ValueError(f"rdfa: unresolvable CURIE {term!r}")

    def parse(self) -> list[tuple]:
        self._walk(self.root, about=None, lang=None)
        return self.out

    def _walk(self, el: ET.Element, about: str | None, lang: str | None) -> None:
        a = el.get("about")
        if a is not None:
            about = a
        xl = el.get("{%s}lang" % _XML_NS)
        if xl is not None:
            lang = xl or None
        name = _localname(el.tag)
        if name in ("meta", "title") and el.get("property") is not None:
            subj = el.get("about") or about
            if subj is None:
                raise ValueError("rdfa: property with no subject in scope")
            pred = self._expand(el.get("property"))
            val = el.get("content")
            if val is None:
                val = el.text or ""
            dt = el.get("datatype")
            self.out.append(
                (
                    subj, pred, val, False,
                    None if dt else lang,
                    self._expand(dt) if dt else None,
                )
            )
        elif name == "link":
            subj = el.get("about") or about
            href = el.get("href") or el.get("resource")
            if el.get("rel") is not None and href is not None:
                if subj is None:
                    raise ValueError("rdfa: rel with no subject in scope")
                self.out.append(
                    (subj, self._expand(el.get("rel")), href, True, None, None)
                )
            elif el.get("rev") is not None and href is not None:
                if subj is None:
                    raise ValueError("rdfa: rev with no subject in scope")
                self.out.append(
                    (href, self._expand(el.get("rev")), subj, True, None, None)
                )
        for child in el:
            self._walk(child, about, lang)


def distill_rdfa_text(text: str) -> list[tuple]:
    """Distill one XHTML+RDFa document to triple tuples (the
    reference's render-decorator re-parse, decorators.py:201-227)."""
    return _RdfaDoc(text).parse()


def distill_rdfa(docs: DataFrame, col: str = "xhtml") -> DataFrame:
    """DataFrame of XHTML+RDFa documents -> triples table, one
    ElementTree walk per row inside mapInPandas (shared wrapper
    turtle.parse_docs_with; RDFa needs no skolem scope — head
    metadata carries explicit subjects)."""
    from ferenda_spark.operators.turtle import parse_docs_with

    return parse_docs_with(
        lambda text, _scope: distill_rdfa_text(text), docs, col
    )
