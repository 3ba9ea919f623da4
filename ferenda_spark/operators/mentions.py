"""Mention stage: sections -> mentions, plus mention -> URI formatting.

Scan is a vectorized pandas UDF (compiled regex registry, Arrow
batches) returning an array of mention structs per row, exploded
relationally — the reference's recursive tree markup
(citationparser.py:98-165) stays a join against entities instead.

URI formatting (uriformatter.py:32-52 rule-dict semantics) is pure
column expressions keyed by pattern name — JVM-side, codegen-able;
no Python in that hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferenda_spark.config import PipelineConfig

_MENTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("pattern", T.StringType()),
            T.StructField("mention_text", T.StringType()),
            T.StructField("captured", T.MapType(T.StringType(), T.StringType())),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_MENTION_STRUCT)
def _scan_udf(texts: pd.Series) -> pd.Series:
    from ferenda_spark.functions.patterns import scan_text

    return texts.map(lambda t: scan_text(t) if t else [])


def detect_mentions(segments: DataFrame) -> DataFrame:
    """segments -> mentions(url, frag_id, pattern, mention_text,
    captured, start, end). Scans section text and the doc-level
    abstract row alike."""
    return (
        segments.select(
            "url",
            "docid",
            "frag_id",
            F.explode(_scan_udf(F.col("text"))).alias("m"),
        )
        .select(
            "url",
            "docid",
            "frag_id",
            F.col("m.pattern").alias("pattern"),
            F.col("m.mention_text").alias("mention_text"),
            F.col("m.captured").alias("captured"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
        )
    )


def mention_target_uri(mentions: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Attach `target_uri` per mention via the formatter rule dict.

    section_internal needs the subject document's own URI; the
    docid rides on every mention row (stamped at segmentation —
    SURVEY.md §4: avoid a |docs|-sized join by construction).
    """
    base = f"{cfg.base_uri}/res/{cfg.alias}"
    own_docid = F.col("docid")
    target = (
        F.when(
            F.col("pattern") == "sec_of_rfc",
            F.concat(
                F.lit(base + "/"),
                F.col("captured")["rfc"],
                F.lit("#S"),
                F.col("captured")["section"],
            ),
        )
        .when(
            F.col("pattern") == "rfc",
            F.concat(F.lit(base + "/"), F.col("captured")["rfc"]),
        )
        .when(F.col("pattern") == "url", F.col("mention_text"))
        .when(
            F.col("pattern") == "section_internal",
            F.concat(
                F.lit(base + "/"), own_docid, F.lit("#S"), F.col("captured")["section"]
            ),
        )
        .otherwise(F.lit(None))
    )
    return mentions.withColumn("target_uri", target)
