"""Count-min sketch: mergeable heavy-hitter counting in bounded memory.

The CMS is the classic fixed-size frequency summary for unbounded key
cardinality (Cormode & Muthukrishnan 2005): D independent hash rows of
W counters; increment one counter per row per occurrence; estimate a
key's count as the MIN over its D counters (always >= truth, biased up
by collisions). At 100 TB the full token histogram does not fit
anywhere, but a D x W integer grid does — and the grid is ALGEBRAIC:
cell-wise sum of two sketches equals the sketch of the union, so
per-partition (or per-stream-batch) sketches merge map-side, exactly
like the engine's HLL and rollup partials.

Everything is integer arithmetic on the portable 31-bit hash, so the
sketch — build, merge, estimate — replays exactly in ANSI SQL
(``sql_cms_buckets``) and hash-matches a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from martian_moments_spark.llmops.textops import (
    HASH_P,
    portable_hash31,
    sql_portable_hash31,
)

# D pairwise-independent-ish affine hash rows over the portable hash;
# kept deliberately small/odd like MINHASH_SEEDS.
CMS_SEEDS: tuple[tuple[int, int], ...] = ((3, 7919), (5, 15838), (7, 23757), (11, 31676))
CMS_WIDTH = 1024


def cms_bucket(col: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Counter index of ``col`` (a string) in hash row ``row``."""
    a, b = CMS_SEEDS[row]
    return (portable_hash31(col) * a + b) % F.lit(HASH_P) % F.lit(width)


def sql_cms_bucket(expr: str, row: int, width: int = CMS_WIDTH) -> str:
    a, b = CMS_SEEDS[row]
    return f"((({sql_portable_hash31(expr)}) * {a} + {b}) % {HASH_P}) % {width}"


def cms_build(df: DataFrame, key_col: str, weight_col: str | None = None) -> DataFrame:
    """Build the sketch: ``(row, bucket, total)`` — D rows per distinct
    key aggregated into at most D*W cells, in ONE pass over ``df``
    (the D hash rows explode from an inline array, never D union
    branches re-scanning the source). One shuffle keyed on
    (row, bucket); partials combine map-side. ``weight_col`` (BIGINT)
    counts each key row that many times (pre-aggregated inputs)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(F.col(key_col), r).cast("int").alias("bucket"),
            )
            for r in range(len(CMS_SEEDS))
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"), w.alias("w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("w").cast("long").alias("total"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches: cell-wise sum. Exactly equals the sketch of
    the concatenated inputs (the algebraic property the streaming /
    incremental paths rely on; pinned in tests)."""
    return (
        a.unionAll(b)
        .groupBy("row", "bucket")
        .agg(F.sum("total").cast("long").alias("total"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the D rows of its
    counter, where a cell ABSENT from the sketch counts as 0 (true CMS
    semantics — a never-seen key estimates exactly 0, via a left join,
    never a silent drop). Returns one row per input key with
    ``cms_estimate BIGINT``. The probe explodes D rows per key in one
    pass and equi-joins the tiny broadcast sketch, never scanning the
    corpus."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(F.col(key_col), r).cast("int").alias("bucket"),
            )
            for r in range(len(CMS_SEEDS))
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(cells).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("total"), F.lit(0))).cast("long").alias("cms_estimate")
    )
