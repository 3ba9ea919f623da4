"""Entity linking: name mentions -> gazetteer entities -> minted URIs.

Reference semantics (documentrepository.py:528-575 lookup_resource):
exact label match first, then fuzzy (difflib.get_close_matches,
cutoff 0.8) with a warning. The gazetteer is small (dimension-sized)
— classic broadcast join; the fuzzy pass only runs on the exact-miss
remainder, as a vectorized pandas UDF scoring each candidate name
against the broadcast label list.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferenda_spark.config import PipelineConfig

GAZETTEER_SCHEMA = T.StructType(
    [
        T.StructField("slug", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("alt_labels", T.ArrayType(T.StringType()), True),
    ]
)


def gazetteer_df(spark: SparkSession, cfg: PipelineConfig | None = None) -> DataFrame:
    from ferenda_spark.datagen import gazetteer_rows

    rows = [
        (g["slug"], g["label"], g["alt_labels"]) for g in gazetteer_rows(cfg)
    ]
    return spark.createDataFrame(rows, GAZETTEER_SCHEMA)


def _name_lookup(gaz: DataFrame) -> DataFrame:
    """Exploded (name_lower -> primary label) lookup incl. alt labels."""
    return (
        gaz.select(
            F.col("label"),
            F.explode(
                F.array_union(F.array(F.col("label")), F.col("alt_labels"))
            ).alias("name"),
        )
        .select(F.lower(F.col("name")).alias("name_lower"), "label")
        .dropDuplicates(["name_lower"])
    )


def link_names(
    names: DataFrame,
    gaz: DataFrame,
    cfg: PipelineConfig,
    name_col: str = "publisher_name",
) -> DataFrame:
    """names(..., name_col) -> + entity_label, link_method.

    Exact pass: broadcast equi-join on lowercase name.
    Fuzzy pass: only exact-miss rows, difflib ratio >= cfg.fuzzy_cutoff
    against the broadcast candidate list (mirrors get_close_matches).
    """
    lookup = _name_lookup(gaz)
    exact = names.join(
        F.broadcast(lookup),
        F.lower(F.col(name_col)) == F.col("name_lower"),
        "left",
    ).drop("name_lower")

    cand = [(r["name_lower"], r["label"]) for r in lookup.collect()]
    cutoff = cfg.fuzzy_cutoff

    @F.pandas_udf(T.StringType())
    def fuzzy_match(s: pd.Series) -> pd.Series:
        import difflib

        names_l = [c[0] for c in cand]
        by_name = dict(cand)

        def best(v):
            if not v:
                return None
            got = difflib.get_close_matches(v.lower(), names_l, n=1, cutoff=cutoff)
            return by_name[got[0]] if got else None

        return s.map(best)

    # difflib is O(|label|²) per candidate — run it once per DISTINCT
    # unmatched surface form (misspellings repeat across a corpus:
    # web-scale name distributions are Zipf), then broadcast-join the
    # tiny resolution table back onto the rows.  Whether a name
    # exact-matches is a function of the name alone, so hit/miss
    # never splits rows of one surface form across branches — which
    # is what lets this stay ONE scan of `names` (exact left-join,
    # fuzzy-resolution left-join, coalesce) instead of the
    # hits/misses filter pair + union that would scan the upstream
    # (a segment-table slice) twice per consumer.
    miss_names = (
        exact.filter(F.col("label").isNull())
        .select(F.col(name_col).alias("_fz_name"))
        .distinct()
        .withColumn("_fz_label", fuzzy_match(F.col("_fz_name")))
    )
    return (
        exact.join(
            F.broadcast(miss_names),
            exact[name_col] == miss_names["_fz_name"],
            "left",
        )
        .drop("_fz_name")
        .withColumn(
            "link_method",
            F.when(F.col("label").isNotNull(), F.lit("exact")).when(
                F.col("_fz_label").isNotNull(), F.lit("fuzzy")
            ),
        )
        .withColumn("entity_label", F.coalesce("label", "_fz_label"))
        .drop("label", "_fz_label")
    )
