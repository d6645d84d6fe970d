"""Event-time windowing queries (SURVEY.md §2.10 and beyond).

The reference has no event-time windows (its late-data story is the
gap-detection feedback loop, E6) — but the engine's streaming surface
(BASELINE.json north star) needs them. These queries run the SAME
``F.window`` / ``F.session_window`` expressions Structured Streaming
uses, in batch mode over the ``events`` table, which makes their
semantics oracle-checkable; the live-stream versions (watermarks,
checkpoints, foreachBatch sinks) are in martian_moments_spark.streaming
with their own integration tests.

Windows are epoch-aligned in both engines (Spark aligns to the Unix
epoch; DuckDB time_bucket's 2000-01-01 origin is epoch-congruent for
sub-day intervals), so bucket starts match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from martian_moments_spark.catalog import load
from martian_moments_spark.functions.numeric import fixed_sum, sql_fixed_sum
from martian_moments_spark.plans.registry import register


@register(
    "tumbling_window_agg",
    ops=("A1", "A3"),
    bench=True,
    oracle=f"""
        SELECT
            time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
            event_type,
            COUNT(*) AS n_events,
            COUNT(DISTINCT user_id) AS n_users,
            {sql_fixed_sum("value")} AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the
    streaming aggregate shape (readStream → groupBy(window(ts)) →
    agg), run in batch mode. At scale: one shuffle on
    (window, event_type); partial aggregation means the shuffle
    carries one row per group per task."""
    events = load(spark, sf_dir, "events").select("ts", "event_type", "user_id", "value")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            fixed_sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "n_users", "total_value")
    )


@register(
    "sliding_window_agg",
    ops=("A1",),
    oracle=f"""
        SELECT
            time_bucket(INTERVAL 30 MINUTE, ts) - (k * INTERVAL 30 MINUTE) AS window_start,
            COUNT(*) AS n_events,
            {sql_fixed_sum("value")} AS total_value
        FROM events, UNNEST([0, 1]) AS u(k)
        GROUP BY 1
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 30-minute slide): every event
    lands in length/slide = 2 windows. Spark expands the window
    expression to those assignments before aggregating — same shuffle
    shape as tumbling, 2x the pre-aggregation rows."""
    events = load(spark, sf_dir, "events").select("ts", "value")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "session_window_agg",
    ops=("A1", "W2"),
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                > INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sessioned AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 6 HOUR AS session_end,
               COUNT(*) AS n_events,
               {sql_fixed_sum("value")} AS total_value
        FROM sessioned
        GROUP BY user_id, session_seq
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (6-hour inactivity gap) per user — Spark's
    session_window in batch mode. The oracle derives the identical
    sessions relationally (lag → new-session flag → running sum →
    group), pinning the semantics: session end = last event + gap.

    Scale: sessionization shuffles once on user_id; skewed users are
    AQE-split. In streaming this same expression runs with a watermark
    bounding session state."""
    events = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    return (
        events.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fixed_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "topic_routed_dispatch",
    ops=("E2", "S7", "N8"),
    oracle="""
        SELECT
            event_id,
            CASE event_type
                WHEN 'error'  THEN 'alerts'
                WHEN 'signup' THEN 'onboarding'
                ELSE 'activity'
            END AS topic,
            to_json(struct_pack(
                event_id := event_id,
                user_id := user_id,
                kind := event_type
            )) AS message
        FROM events
    """,
)
def topic_routed_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-routed message dispatch — the reference's per-topic Kafka
    parser/producer (src/utils/kafka.py:9-24: match topic → payload
    shape) inverted into routing: each event is assigned an output
    topic and serialized as the control-message JSON a Kafka sink would
    carry (value = to_json(struct(...)))."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    topic = (
        F.when(F.col("event_type") == "error", "alerts")
        .when(F.col("event_type") == "signup", "onboarding")
        .otherwise("activity")
    )
    return events.select(
        "event_id",
        topic.alias("topic"),
        F.to_json(
            F.struct(
                F.col("event_id").alias("event_id"),
                F.col("user_id").alias("user_id"),
                F.col("event_type").alias("kind"),
            )
        ).alias("message"),
    )


SESSION_GAP_SECONDS = 1800


@register(
    "sessionize_events",
    ops=("W2", "A1", "F8"),
    oracle=f"""
        WITH ordered AS (
            -- floor(epoch) matches Spark's ts.cast('long') truncation;
            -- a bare CAST(epoch(..) AS BIGINT) would ROUND sub-second
            -- parts and flip gaps within ~1s of the session boundary
            SELECT user_id, event_id, ts,
                   LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_s,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
            FROM events
        )
        SELECT user_id, event_id, ts,
               CAST(SUM(CASE WHEN prev_s IS NULL
                             OR ts_s - prev_s > {SESSION_GAP_SECONDS}
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM ordered
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session ID assignment — the per-EVENT companion to
    session_window_agg's per-session rollup: a new session starts at
    the first event or after a gap > 30 min, and every event carries
    its user-local session index (lag -> gap flag -> running sum).
    This is the labeling a sessionized training corpus or funnel
    analysis needs when individual events must stay addressable.

    Scale: one shuffle on user_id establishes the partitioning; both
    window passes (lag, cumsum) reuse it — a single Exchange in the
    plan. Gap arithmetic is integer epoch seconds: exact."""
    events = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("long")
    prev_s = F.lag(ts_s).over(order)
    new_session = F.when(
        prev_s.isNull() | ((ts_s - prev_s) > SESSION_GAP_SECONDS), 1
    ).otherwise(0)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session)
        .over(order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("session_idx"),
    )
