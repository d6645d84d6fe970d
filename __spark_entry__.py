"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``martian_moments_spark.plans`` — one entry per implemented operator
from SURVEY.md §2 (plus the LLM-data extensions), each paired with a
DuckDB-runnable ANSI-SQL oracle where SQL can express the semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from martian_moments_spark.plans import load_all
from martian_moments_spark.plans import registry as _registry

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily_activity) on /root/testdata/sf0.001."""
    return _registry.REGISTRY["daily_activity"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracles()
