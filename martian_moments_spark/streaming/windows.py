"""Watermarked event-time aggregation over streams.

The batch-mode semantics of these exact expressions are oracle-checked
in plans.queries_streaming; here they run with watermarks so state is
bounded and late data is dropped deterministically — the engine's
late-data policy beyond the reference's batch gap-detection loop (E6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from martian_moments_spark.functions.numeric import fixed_sum


def watermarked_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time aggregate with a watermark: windows finalize
    once the watermark passes window end; rows later than the watermark
    are dropped (bounded state — the property that lets this run
    forever on a 1000-executor cluster)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *group_cols, "n_events", "total_value")
    )


def watermarked_session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows under a watermark: a session closes when the
    watermark passes last-event + gap. State per key is one open
    session, merged as events arrive (Spark's session_window merge)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), fixed_sum("value").alias("total_value"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def watermarked_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound:
    right-side events join left-side events with the same key whose
    timestamp falls in [left_ts, left_ts + within] — the
    attribution/enrichment shape (impression ⟕ click-within-horizon).

    Both sides carry watermarks and the join condition bounds the time
    range in BOTH directions, which is what lets Spark expire state:
    a buffered left row can be dropped once the right watermark passes
    left_ts + within, so state is O(events in the horizon), not the
    whole stream — the property that keeps this runnable forever at
    scale. Each micro-batch pays one co-partitioned shuffle on the key.

    Input columns keep their side via the ``l``/``r`` aliases — select
    with qualified names (``F.col("l.user_id")``) downstream."""
    from functools import reduce

    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    keys = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols]
    bound = [
        F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"),
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"),
    ]
    cond = reduce(lambda a, b: a & b, keys + bound)
    return l.join(r, cond, how)


def dedup_within_watermark(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: duplicate deliveries of the same
    id within the watermark horizon are dropped; state for an id is
    freed once the watermark passes it (bounded memory — the property
    plain dropDuplicates lacks on an infinite stream). The streaming
    analog of the incremental layer's keyed dedup (E8)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
