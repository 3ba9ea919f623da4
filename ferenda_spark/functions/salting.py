"""Skew-salting helper for hot-key joins.

The mention->entity resolution join (SURVEY.md J1) is skewed: a few
canonical URIs (popular documents/entities) dominate. AQE skew-join
splitting handles most of it at runtime; this helper is the explicit
variant for when one side can be replicated — salt the big side with
pmod(xxhash64(random-ish deterministic col), k) and explode the
small side k ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `key`, salting the big side `salt` ways
    and exploding the small side to match. Output columns = normal
    join output (salt column dropped)."""
    b = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
