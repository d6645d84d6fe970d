"""Named relational operators.

The reference's operators appear inline in its dbt models; here each
is a reusable function. The two custom joins — as-of and bucketized
range — are the operators Spark has no primitive for (SURVEY §2.3 J6
is their degenerate equi+BETWEEN form); both are compositions of
shuffle-once built-ins, never theta joins.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join with an explicitly broadcast dimension (J1/J2) — the
    bounded-dim case (reference: 4-row rover dim) where shipping the
    dim to every executor beats any shuffle at any fact scale."""
    return fact.join(F.broadcast(dim), on, how)


def anti_join_gaps(expected: DataFrame, actual: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Expected-minus-actual on a grain key (J4) — the reference's gap
    detector idiom LEFT JOIN + WHERE right IS NULL
    (validation_photo_gaps.sql:54-59) as a first-class left_anti."""
    return expected.join(actual.select(*keys), list(keys), "left_anti")


def case_map(col: str, mapping: Mapping, default=None) -> Column:
    """Dictionary CASE map (P9; dim_rovers.sql:7-13). For maps too big
    to inline, broadcast-join a lookup DataFrame instead."""
    out = None
    for k, v in mapping.items():
        cond = F.col(col) == k
        out = F.when(cond, v) if out is None else out.when(cond, v)
    return out.otherwise(default) if out is not None else F.lit(default)


def high_watermark_filter(source: DataFrame, target: DataFrame, wm_col: str) -> DataFrame:
    """Incremental delta selection (P4/A5/X1): rows of ``source``
    strictly above MAX(wm_col) of ``target``. The scalar aggregate
    collapses to a literal at plan time so the filter pushes into the
    source scan; an empty target selects everything."""
    wm = target.agg(F.max(wm_col)).first()[0]
    return source if wm is None else source.filter(F.col(wm_col) > F.lit(wm))


def topk_per_group(
    df: DataFrame, partition: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Top-k rows per group via partitioned row_number (W2/O2): one
    shuffle on the group key, no global sort. ``order`` must include a
    unique tie-break for deterministic results."""
    w = W.partitionBy(*partition).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the latest right row of the same
    key with right_time <= left_time (< if ``strict``);
    ``direction="forward"`` instead takes the EARLIEST right row with
    right_time >= left_time (> if ``strict``) — the lookahead form
    (next scheduled maintenance, next price revision). With
    ``tolerance``, a match additionally requires the time gap
    (left-right backward, right-left forward) to be <= tolerance
    (same unit as the time columns; seconds for timestamps) — staler
    matches yield NULL, the max-staleness semantics of pandas
    ``merge_asof(tolerance=..., direction=...)``.

    Algorithm (the merge-sort formulation, not a range cross-join):
    union both sides tagged, sort within key by (time, side-tag,
    tie-break), and carry the right side's values forward with
    last(ignorenulls) — then keep left rows. ONE shuffle on the key;
    state is one row; no interval explosion. This is the 100 TB form:
    a windowed scan over key-partitioned, time-sorted data.

    The reference's camera_travel_correlation (J6) is the degenerate
    case where an equi-key pre-bounds the match to a single interval.

    ``right_tiebreak`` (a value_col name) makes the winner among
    equal-timestamp right rows deterministic (largest value wins) —
    required for hash-stable results under any partitioning.

    ``direction="nearest"`` (pandas merge_asof parity) takes whichever
    of the backward/forward candidates is closer in time, ties to the
    backward one. Same single shuffle: both carries are window scans
    over the one key-partitioned merged frame (two sorts, one
    Exchange — Spark reuses the partitioning across window specs that
    share partitionBy).
    """
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, on, left_time, right_time, value_cols,
            strict=strict, right_tiebreak=right_tiebreak, tolerance=tolerance,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    # side tag orders right rows before left (in scan order) at equal
    # timestamps, so the boundary is inclusive; strict flips the tag
    # order. Forward scans time-descending — same carry, mirrored.
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l = left.withColumn("__k", F.col(on)).withColumn("__t", F.col(left_time)).withColumn(
        "__side", F.lit(left_tag)
    )
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(r.schema[f"__v_{c}"].dataType))
    merged = l.select(*[f"__v_{c}" for c in value_cols], "__k", "__t", "__side", *left.columns).unionByName(
        r, allowMissingColumns=True
    )
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    order = [t_order, F.col("__side").asc()]
    if right_tiebreak:
        # NULLS FIRST so left rows (NULL value cols) never outrank the
        # right rows they tie with on (__t, __side).
        order.append(F.col(f"__v_{right_tiebreak}").asc_nulls_first())
    w = W.partitionBy("__k").orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    for c in value_cols:
        merged = merged.withColumn(f"__asof_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    if tolerance is not None:
        # carry the winner's own timestamp in the same pass, then null
        # out values whose match is staler than the tolerance window
        merged = merged.withColumn(
            "__vt",
            F.when(F.col("__side") == right_tag, F.col("__t")),
        ).withColumn("__asof_t", F.last("__vt", ignorenulls=True).over(w))
        gap = F.col("__t").cast("double") - F.col("__asof_t").cast("double")
        if direction == "forward":
            gap = -gap
        fresh = gap <= F.lit(float(tolerance))
        for c in value_cols:
            merged = merged.withColumn(
                f"__asof_{c}", F.when(fresh, F.col(f"__asof_{c}"))
            )
    return (
        merged.filter(F.col("__side") == left_tag)
        .select(
            *left.columns,
            *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """asof_join(direction="nearest"): both directional carries over
    ONE key-partitioned merged frame — an ascending scan for the
    backward candidate, a descending scan for the forward one — then a
    per-row choice of the closer match (tie -> backward). tolerance
    nulls each side independently BEFORE the choice, so a too-stale
    backward match loses to a fresh forward one."""
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l = left.withColumn("__k", F.col(on)).withColumn("__t", F.col(left_time)).withColumn(
        "__side", F.lit(left_tag)
    )
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(r.schema[f"__v_{c}"].dataType))
    merged = l.select(
        *[f"__v_{c}" for c in value_cols], "__k", "__t", "__side", *left.columns
    ).unionByName(r, allowMissingColumns=True)

    order_b = [F.col("__t").asc(), F.col("__side").asc()]
    order_f = [F.col("__t").desc(), F.col("__side").asc()]
    if right_tiebreak:
        # ASCENDING in BOTH scans: last(ignorenulls) keeps the value
        # closest in scan order before the left row, so ascending puts
        # the LARGEST tied value there — the same largest-value-wins
        # rule as the directional paths. (A descending forward
        # tiebreak would carry the smallest tied value instead; the
        # brute-force property test caught exactly that.)
        order_b.append(F.col(f"__v_{right_tiebreak}").asc_nulls_first())
        order_f.append(F.col(f"__v_{right_tiebreak}").asc_nulls_first())
    w_b = W.partitionBy("__k").orderBy(*order_b).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_f = W.partitionBy("__k").orderBy(*order_f).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    rt = F.when(F.col("__side") == right_tag, F.col("__t"))
    merged = merged.withColumn("__b_t", F.last(rt, ignorenulls=True).over(w_b))
    merged = merged.withColumn("__f_t", F.last(rt, ignorenulls=True).over(w_f))
    for c in value_cols:
        merged = merged.withColumn(
            f"__b_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w_b)
        ).withColumn(f"__f_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w_f))
    gap_b = F.col("__t").cast("double") - F.col("__b_t").cast("double")
    gap_f = F.col("__f_t").cast("double") - F.col("__t").cast("double")
    b_ok = F.col("__b_t").isNotNull()
    f_ok = F.col("__f_t").isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (gap_b <= F.lit(float(tolerance)))
        f_ok = f_ok & (gap_f <= F.lit(float(tolerance)))
    take_b = b_ok & (~f_ok | (gap_b <= gap_f))
    out_cols = [
        F.when(take_b, F.col(f"__b_{c}"))
        .when(f_ok, F.col(f"__f_{c}"))
        .alias(f"asof_{c}")
        for c in value_cols
    ]
    return merged.filter(F.col("__side") == left_tag).select(*left.columns, *out_cols)


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi-key (the generalization
    of J6): never a theta join — both sides are mapped to fixed-width
    time buckets (intervals explode to every bucket they overlap), the
    join is equi on the bucket id, and the exact BETWEEN filters the
    residue.

    Shuffle is on bucket id; cost is O(matches + bucket collisions),
    tunable via ``bucket_seconds`` (set ~ median interval length).
    Skewed buckets fall to AQE skew-join handling."""
    b = F.lit(bucket_seconds)
    lb = left.withColumn("__bucket", (F.unix_timestamp(F.col(point_col)) / b).cast("long"))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    return lb.join(ib, "__bucket").filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    ).drop("__bucket")


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    num_buckets: int = 4096,
) -> DataFrame:
    """Join with an explicit Bloom-style prefilter on the big side: the
    small side's join keys are digested into ``pmod(xxhash64(keys),
    num_buckets)`` bucket ids (a single-hash Bloom filter with exact
    bucket membership — false positives possible, false negatives
    impossible), the digest is collected (bounded by ``num_buckets``
    ints, never by small's row count) and applied to the big side as an
    ``isin`` — Catalyst compiles it to an O(1) InSet probe inside
    whole-stage codegen — so non-matching big rows are dropped BEFORE
    the join shuffle instead of after it.

    This is the manual form of Spark's runtime bloom-filter join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), for when the
    optimizer's stats heuristics don't fire or the digest should be
    pinned. At 100 TB the win is shuffle bytes: with a 1%-selective
    small side, ~99% of the big fact never leaves the scan stage.

    Only ``inner`` and ``left_semi`` are allowed: the prefilter drops
    big-side rows without matches, which an outer join must preserve.
    A saturated digest (every bucket hit) skips the filter — no pruning
    is possible and the probe would be pure overhead.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi, got {how!r}: "
            "outer joins must keep unmatched big-side rows"
        )
    on = list(on)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in on]), F.lit(num_buckets))
    hit = sorted(
        r[0] for r in small.select(bucket.alias("__bucket")).distinct().collect()
    )
    if len(hit) < num_buckets:
        big = big.filter(bucket.isin(hit))
    return big.join(small, on, how)


def scd2_apply_snapshot(
    current: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    attrs: list[str],
    version: int,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: fold a full snapshot
    into a versioned dimension. ``current`` carries keys + attrs +
    (valid_from INT, valid_to INT nullable, is_current BOOLEAN);
    ``snapshot`` carries keys + attrs as of ``version``. Rules:

    - closed history rows pass through untouched;
    - an open row whose attrs match the snapshot stays open;
    - an open row whose attrs changed, or whose key left the snapshot,
      closes (valid_to = version);
    - a snapshot row with a new key or changed attrs opens a new
      version (valid_from = version, open-ended).

    Attr comparison is null-safe. One full-outer shuffle join on the
    key per snapshot fold — at scale both sides are bucketed by the
    key, and only open rows join (history is partition-pruned by
    is_current)."""
    open_rows = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))

    snap = snapshot.withColumn("__s_present", F.lit(True))
    joined = open_rows.alias("c").join(snap.alias("s"), keys, "full_outer")
    same = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"c.{a}").eqNullSafe(F.col(f"s.{a}")) for a in attrs],
    )
    present_cur = F.col("c.valid_from").isNotNull()
    present_snap = F.col("s.__s_present").isNotNull()

    unchanged = joined.filter(present_cur & present_snap & same).select(
        *keys,
        *[F.col(f"c.{a}").alias(a) for a in attrs],
        F.col("c.valid_from").alias("valid_from"),
        F.col("c.valid_to").alias("valid_to"),
        F.col("c.is_current").alias("is_current"),
    )
    closed = joined.filter(present_cur & (~present_snap | ~same)).select(
        *keys,
        *[F.col(f"c.{a}").alias(a) for a in attrs],
        F.col("c.valid_from").alias("valid_from"),
        F.lit(version).cast("int").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = joined.filter(present_snap & (~present_cur | ~same)).select(
        *keys,
        *[F.col(f"s.{a}").alias(a) for a in attrs],
        F.lit(version).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(opened)
