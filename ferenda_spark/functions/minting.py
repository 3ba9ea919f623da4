"""COIN-style URI minting from broadcast templates.

Reference semantics (thirdparty/coin.py):
- a URISpace holds templates sorted by (priority, forType
  specified, #bindings) DESCENDING (coin.py:37-41 reverse=True) —
  higher priority first, typed before untyped, more-specific
  (more bindings) before less-specific;
- a template matches a resource when its forType (if set) is among
  the resource's rdf:types and EVERY binding finds a value
  (coin.py:132-145);
- the URI is uriTemplate with {var} placeholders replaced by
  slug-transformed binding values (coin.py:149-176), or
  fragmentTemplate appended to the base URI after '#' (or the
  space's fragmentSeparator when the base already has a fragment,
  coin.py:153-158);
- slug transforms chain lowercase → char replacements → space
  replacement → strip pattern (coin.py:57-88);
- coin_uris yields ALL matching templates' URIs in order
  (multi-mint, coin.py:43-47 — the duplicate-URI population that
  canonicalization resolves); coin_uri is the first (coin.py:49-53).

Spark-first: templates are pure data expanded into column
expressions (broadcast by literal capture); coin_uri is one
F.coalesce over per-template F.when exprs, coin_uris one
null-filtered F.array — a single projection, no joins.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.functions.slug import slugify, slugify_col


@dataclass(frozen=True)
class SlugRules:
    """coin.py:57-88 SlugTransformer: the transform chain as data."""

    lowercase: bool = True
    replace: tuple[tuple[str, str], ...] = ()
    space_repl: str = "+"  # coin.py:66-68 default
    strip_pattern: str | None = None


def slug_transform(rules: SlugRules) -> Callable[[Column], Column]:
    """Column transform for a SlugRules chain, applied in the
    reference's order (coin.py:72-88)."""

    def apply(col: Column) -> Column:
        c = F.lower(col) if rules.lowercase else col
        for ch, repl in rules.replace:
            c = F.replace(c, F.lit(ch), F.lit(repl))
        c = F.replace(c, F.lit(" "), F.lit(rules.space_repl))
        if rules.strip_pattern:
            c = F.regexp_replace(c, rules.strip_pattern, "")
        return c

    return apply


@dataclass(frozen=True)
class MintTemplate:
    """One COIN template row (FIXTURES.md §3 uri_templates schema)."""

    template_id: str
    priority: int
    uri_template: str | None = None
    fragment_template: str | None = None
    for_type: str | None = None
    bindings: tuple[str, ...] = ()
    slug: Callable[[Column], Column] | None = None  # None → space default

    def __post_init__(self):
        assert self.uri_template or self.fragment_template, (
            "No template for template"  # coin.py:114
        )


def template_order(templates) -> list[MintTemplate]:
    """coin.py:37-41: priority desc, typed first, more bindings first."""
    return sorted(
        templates,
        key=lambda t: (t.priority, t.for_type or "", len(t.bindings)),
        reverse=True,
    )


_PLACEHOLDER = re.compile(r"\{(\+?\w+)\}")


def _expand(template_str: str, base, slug_fn) -> Column:
    """'{base}/res/{var}' → concat of literals, the base, and
    slug-transformed binding columns (coin.py:161-166)."""
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template_str):
        if m.start() > pos:
            parts.append(F.lit(template_str[pos : m.start()]))
        var = m.group(1)
        if var in ("base", "+base"):
            parts.append(base if isinstance(base, Column) else F.lit(base))
        else:
            parts.append(slug_fn(F.col(var)))
        pos = m.end()
    if pos < len(template_str):
        parts.append(F.lit(template_str[pos:]))
    return F.concat(*parts)


def template_uri_col(
    t: MintTemplate,
    space_base: str,
    type_col: str | None = None,
    base_col: Column | str | None = None,
    default_slug: Callable[[Column], Column] = slugify_col,
    fragment_separator: str = "/",
) -> Column:
    """NULL-unless-matched minted URI for one template
    (coin.py:132-147): forType guard + every binding non-null."""
    slug_fn = t.slug or default_slug
    cond = F.lit(True)
    if t.for_type:
        assert type_col, "for_type template needs a type_col"
        cond = cond & (F.col(type_col) == F.lit(t.for_type))
    for b in t.bindings:
        cond = cond & F.col(b).isNotNull()
    if t.uri_template:
        uri = _expand(t.uri_template, space_base, slug_fn)
    else:
        assert base_col is not None, "fragment template needs a base_col"
        b = F.col(base_col) if isinstance(base_col, str) else base_col
        sep = F.when(b.contains("#"), F.lit(fragment_separator)).otherwise(F.lit("#"))
        uri = F.concat(b, sep, _expand(t.fragment_template, b, slug_fn))
    return F.when(cond, uri)


def coin_uri_col(templates, space_base: str, **kw) -> Column:
    """First matching template's URI (coin.py:49-53), NULL if none."""
    ordered = template_order(templates)
    return F.coalesce(
        *[template_uri_col(t, space_base, **kw) for t in ordered]
    )


def coin_uris_col(templates, space_base: str, **kw) -> Column:
    """ALL matching templates' URIs in template order — the
    multi-mint array (coin.py:43-47)."""
    ordered = template_order(templates)
    arr = F.array(*[template_uri_col(t, space_base, **kw) for t in ordered])
    return F.filter(arr, lambda x: x.isNotNull())


#: Two templates per entity — the duplicate-URI scenario the
#: canonicalize pass must resolve.  ext outranks org under the COIN
#: order (priority desc), so it is the primary mint.
ENTITY_TEMPLATES = (
    MintTemplate(
        "ext", 2, "{base}/ext/{entity_label}", bindings=("entity_label",)
    ),
    MintTemplate(
        "org", 1, "{base}/org/{entity_label}", bindings=("entity_label",)
    ),
)


def mint_entity_uris(label: str, cfg: PipelineConfig) -> list[str]:
    """All URIs for one entity label, in template order (driver-side
    twin of coin_uris_col for tests/gazetteer prep)."""
    slug = slugify(label)
    out = []
    for t in template_order(ENTITY_TEMPLATES):
        uri = t.uri_template
        for var in t.bindings:
            uri = uri.replace("{%s}" % var, slug)
        out.append(uri.replace("{base}", cfg.base_uri))
    return out


def mint_entity_uri_col(
    label_col: Column, cfg: PipelineConfig, template: MintTemplate
) -> Column:
    """One entity template applied to a label column (legacy helper
    for the emit layer; slug = the project slugify)."""
    prefix, suffix = template.uri_template.format(
        base=cfg.base_uri, entity_label="\x00"
    ).split("\x00")
    return F.concat(F.lit(prefix), slugify_col(label_col), F.lit(suffix))
