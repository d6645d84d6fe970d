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


# ---- fixed-range histogram quantile sketch -------------------------
#
# The quantile analog of the CMS above: a fixed number of equal-width
# integer bins over a known value range. Like the CMS it is ALGEBRAIC
# (cell-wise sum merges two histograms into the histogram of the
# union) and pure-integer, so build/merge/estimate replay exactly in
# SQL. Estimation interpolates inside the target bin, so the error is
# bounded by one bin width — the trade every mergeable quantile sketch
# makes, here with a deterministic worst case instead of a
# probabilistic one (t-digest/KLL are NOT reproducible across engines;
# this is, which is why the engine ships it as the incremental
# percentile path).

HIST_BINS = 256


def hist_bin(col: Column, lo: int, hi: int, bins: int = HIST_BINS) -> Column:
    """Bin index of integer-unit values in [lo, hi]: equal-width bins,
    endpoints clamped (values at hi land in the last bin)."""
    raw = ((col - F.lit(lo)) * F.lit(bins)) / (F.lit(hi) - F.lit(lo))
    return F.least(
        F.greatest(F.floor(raw).cast("int"), F.lit(0)), F.lit(bins - 1)
    )


def sql_hist_bin(expr: str, lo: int, hi: int, bins: int = HIST_BINS) -> str:
    return (
        f"LEAST(GREATEST(CAST(floor((({expr}) - {lo}) * {bins} "
        f"/ CAST({hi} - {lo} AS DOUBLE)) AS INT), 0), {bins - 1})"
    )


def hist_build(
    df: DataFrame,
    units_col: str,
    lo: int,
    hi: int,
    group_cols: tuple[str, ...] = (),
    bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group fixed-range histogram: ``(*group_cols, bin, cnt)``.
    One shuffle on (group, bin) with map-side combine; at most
    groups*bins cells survive."""
    return (
        df.select(
            *group_cols, hist_bin(F.col(units_col), lo, hi, bins).alias("bin")
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Cell-wise sum — histogram of the union (pinned in tests)."""
    return (
        a.unionAll(b)
        .groupBy(*group_cols, "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def hist_quantile(
    hist: DataFrame,
    q: float,
    lo: int,
    hi: int,
    group_cols: tuple[str, ...] = (),
    bins: int = HIST_BINS,
    out_col: str = "est",
) -> DataFrame:
    """Estimate the q-quantile per group from the histogram: find the
    first bin whose cumulative count reaches q*total, interpolate
    linearly inside it. Error <= one bin width, deterministic. All
    inputs are integers; the interpolation is a fixed sequence of IEEE
    double ops, so two engines agree bit-for-bit."""
    from pyspark.sql.window import Window as W

    gc = list(group_cols)
    w = W.partitionBy(*gc).orderBy("bin") if gc else W.orderBy("bin")
    cum = hist.select(
        *gc,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(
            W.partitionBy(*gc) if gc else W.partitionBy()
        ).alias("total"),
    )
    target = F.lit(q) * F.col("total").cast("double")
    hit = cum.filter(F.col("cum").cast("double") >= target)
    first = hit.groupBy(*gc).agg(F.min("bin").alias("bin"))
    width = (F.lit(hi) - F.lit(lo)).cast("double") / F.lit(bins)
    est = (
        first.join(cum, gc + ["bin"] if gc else ["bin"])
        .select(
            *gc,
            (
                F.lit(lo)
                + (
                    F.col("bin").cast("double")
                    + (target - F.col("cum_prev").cast("double"))
                    / F.col("cnt").cast("double")
                )
                * width
            ).alias(out_col),
        )
    )
    return est
