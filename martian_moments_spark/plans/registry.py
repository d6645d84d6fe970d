"""Registry of named queries.

Each entry pairs an idiomatic-Spark implementation with the ANSI-SQL
oracle the driver runs through DuckDB (BASELINE.md targets). Column
names are part of the contract: the driver sorts columns by name and
hashes values, so every computed column is aliased identically on both
sides. Queries with no SQL-expressible oracle (streaming-stateful,
approximate) set ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from martian_moments_spark.session import ensure_engine_conf

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB-runnable ANSI SQL, or None → rows-only check
    ops: tuple[str, ...] = ()  # SURVEY.md §2 operator ids this query exercises
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    extra: dict = field(default_factory=dict)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    ops: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register ``fn`` as query ``name``.

    The wrapper pins session conf needed for oracle parity (UTC
    timezone) before building the plan — the driver hands us its own
    SparkSession, so this must be runtime-settable conf only.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, ops=ops, doc=fn.__doc__ or "", bench=bench
        )
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
