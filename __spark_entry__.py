"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query registry in
``bigdata_scala_offline_data_clean_spark.queries`` -- every entry there is a
(PySpark callable, DuckDB oracle SQL) pair; SQL-inexpressible ops register
with ``oracle=None`` and fall back to the driver's rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdata_scala_offline_data_clean_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q1-style pricing summary over sf0.001 lineitem."""
    from bigdata_scala_offline_data_clean_spark.queries.analytics import (
        a01_pricing_summary,
    )

    return a01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data ops)."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query in ``queries()``."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
