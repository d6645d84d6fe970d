"""Deterministic floating-point aggregation.

Parallel double summation is order-dependent in the last ulps, so a
Spark SUM(double) can round differently than a single-threaded oracle
at a decimal boundary. The engine therefore aggregates money-like
doubles in fixed-point: round each value to integer units (exact,
per-row, identical on any engine reading the same parquet doubles),
sum as BIGINT (associative — order-independent), divide back to double
at the end. This makes every aggregate bit-identical across partition
counts, AQE re-plans, and engines — a correctness property the
100 TB target needs anyway (retries/speculative tasks reorder sums).

Each Spark helper has a ``sql_*`` twin that renders the identical
computation as ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_sum(col: Column | str, scale: int = 100) -> Column:
    """Order-independent SUM of a double column, exact to 1/scale."""
    c = F.col(col) if isinstance(col, str) else col
    units = F.round(c * F.lit(scale)).cast("long")
    return F.sum(units).cast("double") / F.lit(float(scale))


def fixed_avg(col: Column | str, scale: int = 10000) -> Column:
    """Order-independent AVG of a double column, exact to 1/scale."""
    c = F.col(col) if isinstance(col, str) else col
    units = F.round(c * F.lit(scale)).cast("long")
    return F.sum(units).cast("double") / F.count(c).cast("double") / F.lit(float(scale))


def sql_fixed_sum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / CAST({scale} AS DOUBLE)"


def sql_fixed_avg(expr: str, scale: int = 10000) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) "
        f"/ CAST(COUNT(({expr})) AS DOUBLE) / CAST({scale} AS DOUBLE)"
    )
