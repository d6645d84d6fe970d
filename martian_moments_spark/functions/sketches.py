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
    key aggregated into at most D*W cells. One shuffle keyed on
    (row, bucket); partials combine map-side. ``weight_col`` (BIGINT)
    counts each key row that many times (pre-aggregated inputs)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = [
        df.select(
            F.lit(r).cast("int").alias("row"),
            cms_bucket(F.col(key_col), r).cast("int").alias("bucket"),
            w.alias("w"),
        )
        for r in range(len(CMS_SEEDS))
    ]
    u = rows[0]
    for other in rows[1:]:
        u = u.unionAll(other)
    return u.groupBy("row", "bucket").agg(F.sum("w").cast("long").alias("total"))


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
    counter. Returns ``keys`` plus ``cms_estimate BIGINT``. The probe
    is an equi-join of D rows per key against the tiny sketch
    (broadcast), never a scan of the corpus."""
    probes = [
        keys.select(
            F.col(key_col),
            F.lit(r).cast("int").alias("row"),
            cms_bucket(F.col(key_col), r).cast("int").alias("bucket"),
        )
        for r in range(len(CMS_SEEDS))
    ]
    u = probes[0]
    for other in probes[1:]:
        u = u.unionAll(other)
    joined = u.join(F.broadcast(sketch), ["row", "bucket"])
    return joined.groupBy(key_col).agg(
        F.min("total").cast("long").alias("cms_estimate")
    )
