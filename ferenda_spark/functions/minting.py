"""COIN-style URI minting from broadcast templates.

Reference semantics (thirdparty/coin.py:100-205): templates are
tried in (priority, forType, #bindings) order; a matching template
builds a URI from uriTemplate with slug transforms. Ferenda
deliberately mints *multiple* URIs per entity (coin.py:43-47,
dv.py:1466) and reconciles them via owl:sameAs — our canonicalization
input.

Templates here are pure data expanded as column expressions (the
only variable is the slug), broadcast implicitly via literal capture.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.functions.slug import slugify, slugify_col


@dataclass(frozen=True)
class MintTemplate:
    template_id: str
    priority: int
    uri_template: str  # '{base}/ext/{slug}'


#: Two templates per entity — the duplicate-URI scenario the
#: canonicalize pass must resolve.
ENTITY_TEMPLATES = (
    MintTemplate("ext", 1, "{base}/ext/{slug}"),
    MintTemplate("org", 2, "{base}/org/{slug}"),
)


def mint_entity_uris(label: str, cfg: PipelineConfig) -> list[str]:
    """All URIs for one entity label, in template priority order."""
    slug = slugify(label)
    return [
        t.uri_template.format(base=cfg.base_uri, slug=slug)
        for t in sorted(ENTITY_TEMPLATES, key=lambda t: t.priority)
    ]


def mint_entity_uri_col(label_col: Column, cfg: PipelineConfig, template: MintTemplate) -> Column:
    prefix, suffix = template.uri_template.format(base=cfg.base_uri, slug="\x00").split("\x00")
    return F.concat(F.lit(prefix), slugify_col(label_col), F.lit(suffix))
