"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship KG-construction query;
``queries()``/``oracle_sql()`` expose the operator catalog from
``ferenda_spark.queries`` (SURVEY.md §2 coverage + training-data
ops), each Spark plan paired with an independent DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ferenda_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (extract → segment → mention →
    mint/link → emit → canonicalize) over deterministic synthetic
    Common-Crawl-style pages sized by sf0.001, returning the triples
    DataFrame."""
    return _catalog.q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
