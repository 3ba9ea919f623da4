"""Slug transforms for URI minting.

Reference: COIN SlugTransformer (thirdparty/coin.py:57-97) — chained
lowercase / space-replace / strip-pattern. The chain is expressible
as pure column functions (lower + regexp_replace), used identically
on driver (template expansion) and executors (column exprs).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_STRIP = re.compile(r"[^a-z0-9 ]+")
_SPACES = re.compile(r"\s+")


def slugify(label: str) -> str:
    s = label.lower()
    s = _STRIP.sub("", s)
    s = _SPACES.sub("-", s.strip())
    return s


def slugify_col(col: Column) -> Column:
    s = F.lower(col)
    s = F.regexp_replace(s, r"[^a-z0-9 ]+", "")
    s = F.regexp_replace(F.trim(s), r"\s+", "-")
    return s
