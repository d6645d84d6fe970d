"""Incremental-processing queries (SURVEY.md §4 X1-X3, §2.10 E7-E8).

The reference's materialization strategies: high-watermark incremental
append (dbt ``is_incremental()`` + ``ingestion_date > (SELECT MAX(...)
FROM {{this}})``, 7 models) and keyed MERGE upsert
(``incremental_strategy='merge'`` on ``unique_key``, 3 models). Plain
parquet has no MERGE, so the engine expresses upsert as
anti-join + union with a deterministic last-writer-wins tie-break —
the batch semantics a streaming ``foreachBatch`` sink would apply.

The queries here *simulate* target-vs-source with deterministic splits
of one table, so the merged result is SQL-expressible and the oracle
exact.

Scale: the anti-join and the dedup window both shuffle on the merge
key only; at 100 TB target and delta are partitioned/bucketed by the
key so the rewrite touches matching partitions, never the full table
(SURVEY §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from martian_moments_spark.catalog import load
from martian_moments_spark.functions.numeric import fixed_sum, sql_fixed_sum
from martian_moments_spark.llmops.textops import portable_hash31, sql_portable_hash31
from martian_moments_spark.plans.registry import register


@register(
    "incremental_append",
    ops=("E7", "P4", "A5", "U1"),
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice,
               (o_orderdate > TIMESTAMP '1997-01-01 00:00:00') AS from_delta
        FROM orders
    """,
)
def incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental append — dbt 'append' strategy
    (flat_photo_response.sql:1-7,27-29): target holds rows up to the
    watermark; one refresh selects source rows strictly above
    MAX(watermark-column) of the target and unions them on. The result
    must equal the full source (append loses nothing, duplicates
    nothing); from_delta marks which rows the delta carried."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    target = orders.filter(F.col("o_orderdate") <= F.lit("1997-01-01").cast("timestamp"))
    # Engine pattern X1: scalar aggregate → literal, so the delta filter
    # pushes into the source scan.
    wm = target.agg(F.max("o_orderdate")).first()[0]
    delta = orders.filter(F.col("o_orderdate") > F.lit(wm))
    return target.withColumn("from_delta", F.lit(False)).unionByName(
        delta.withColumn("from_delta", F.lit(True))
    )


@register(
    "merge_upsert",
    ops=("E8", "J4", "U1"),
    bench=True,
    oracle="""
        WITH existing AS (
            SELECT l_orderkey, l_linenumber, l_quantity, 'existing' AS row_version
            FROM lineitem
            WHERE l_linenumber <= 4
        ),
        incoming AS (
            SELECT l_orderkey, l_linenumber, l_quantity * 2 AS l_quantity,
                   'incoming' AS row_version
            FROM lineitem
            WHERE l_linenumber >= 3
        )
        SELECT * FROM incoming
        UNION ALL
        SELECT e.* FROM existing e
        WHERE NOT EXISTS (
            SELECT 1 FROM incoming i
            WHERE i.l_orderkey = e.l_orderkey AND i.l_linenumber = e.l_linenumber
        )
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE upsert without a MERGE primitive — dbt 'merge' on
    unique_key (flat_manifest_response.sql:1-7: rover_name;
    flat_coordinate_response.sql: [rover_name, sol]) rewritten as
    incoming ∪ (existing ⟕anti incoming): incoming rows win on key
    collision, unmatched existing rows survive (SURVEY X2).

    existing = items 1-4, incoming = items ≥3 with updated quantity, so
    keys 3-4 collide and must carry the incoming version."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    existing = li.filter(F.col("l_linenumber") <= 4).withColumn(
        "row_version", F.lit("existing")
    )
    incoming = (
        li.filter(F.col("l_linenumber") >= 3)
        .withColumn("l_quantity", F.col("l_quantity") * 2)
        .withColumn("row_version", F.lit("incoming"))
    )
    keys = ["l_orderkey", "l_linenumber"]
    survivors = existing.join(incoming.select(*keys), keys, "left_anti")
    return incoming.unionByName(survivors)


@register(
    "dedup_last_writer",
    ops=("E8", "W2", "A6"),
    oracle="""
        SELECT user_id, event_type, event_id, ts, value
        FROM (
            SELECT user_id, event_type, event_id, ts, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
)
def dedup_last_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins keyed dedup — the deterministic tie-break the
    merge strategy needs when one batch carries several versions of a
    key (SURVEY §7.4.2: max(ingestion_date) per key, with event_id as
    the final tie-break for hash stability). Latest event per
    (user_id, event_type)."""
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


SCD2_CHANGE_MOD = 10  # every 10th customer's balance changes in snapshot 2


@register(
    "scd2_dimension_merge",
    ops=("J3", "P8", "U1", "A6"),
    oracle=f"""
        WITH snap1 AS (
            SELECT c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acct_units,
                   c_mktsegment
            FROM customer
        ), snap2 AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % {SCD2_CHANGE_MOD} = 0
                        THEN acct_units * 2 ELSE acct_units END AS acct_units,
                   c_mktsegment
            FROM snap1
        ), changed AS (
            SELECT s1.c_custkey
            FROM snap1 s1 JOIN snap2 s2 USING (c_custkey)
            WHERE s1.acct_units <> s2.acct_units
               OR s1.c_mktsegment <> s2.c_mktsegment
        )
        SELECT c_custkey, acct_units, c_mktsegment,
               CAST(1 AS INT) AS valid_from, CAST(NULL AS INT) AS valid_to,
               TRUE AS is_current
        FROM snap1 WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT c_custkey, acct_units, c_mktsegment,
               CAST(1 AS INT), CAST(2 AS INT), FALSE
        FROM snap1 WHERE c_custkey IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT c_custkey, acct_units, c_mktsegment,
               CAST(2 AS INT), CAST(NULL AS INT), TRUE
        FROM snap2 WHERE c_custkey IN (SELECT c_custkey FROM changed)
    """,
)
def scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 — the dimension-versioning
    strategy a warehouse layers over MERGE (X2's history-keeping twin):
    fold a new snapshot into a versioned dim, closing changed rows
    (valid_to = new version) and opening replacements, while unchanged
    rows stay open. Snapshot 2 is a deterministic variant of customer
    (every 10th balance doubles), so the full version chain is
    oracle-checkable. Balances are fixed-point units (never
    SUM/compare raw doubles).

    Scale: operators.relational.scd2_apply_snapshot — one full-outer
    key join per fold over only the OPEN rows; closed history never
    joins (at 100 TB it is partition-pruned by is_current)."""
    from martian_moments_spark.operators.relational import scd2_apply_snapshot

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_units"),
        "c_mktsegment",
    )
    dim = cust.select(
        "c_custkey",
        "acct_units",
        "c_mktsegment",
        F.lit(1).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    snap2 = cust.withColumn(
        "acct_units",
        F.when(
            F.col("c_custkey") % SCD2_CHANGE_MOD == 0, F.col("acct_units") * 2
        ).otherwise(F.col("acct_units")),
    )
    return scd2_apply_snapshot(
        dim, snap2, keys=["c_custkey"], attrs=["acct_units", "c_mktsegment"], version=2
    )


ROLLUP_CUTOFF = "2024-01-20 00:00:00"


@register(
    "incremental_rollup_merge",
    ops=("A1", "A4", "E7", "U1"),
    oracle="""
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
               MAX(ts) AS last_ts
        FROM events
        GROUP BY CAST(ts AS DATE), event_type
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic materialized-view maintenance: a persisted daily
    rollup (the partial aggregate of everything before the cutoff) is
    FOLDED TOGETHER with the delta's partial aggregate instead of
    recomputing from raw events — COUNT/SUM/MAX merge by
    sum/sum/max over partials, so merge(partial(base), partial(delta))
    is provably the full recompute, which is exactly what the oracle
    computes from scratch.

    Scale: at 100 TB the base partial is the stored rollup table (read
    O(groups), not O(events)); only the delta — selected by the same
    high-watermark predicate as incremental_append — touches raw data.
    Non-algebraic aggregates (exact distinct) are excluded by
    construction; they need sketch merge (HLL) instead. Fixed-point
    units keep the two-stage double sum bit-identical to the one-stage
    oracle."""
    events = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.to_date("ts").alias("event_date"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_units"),
            F.max("ts").alias("last_ts"),
        )

    base = partial(events.filter(F.col("ts") < cutoff))  # the stored rollup
    delta = partial(events.filter(F.col("ts") >= cutoff))  # the new increment
    return (
        base.unionByName(delta)
        .groupBy("event_date", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_units").alias("value_units"),
            F.max("last_ts").alias("last_ts"),
        )
        .select(
            "event_date",
            "event_type",
            "n_events",
            (F.col("value_units").cast("double") / 100.0).alias("total_value"),
            "last_ts",
        )
    )


@register(
    "incremental_distinct_merge",
    ops=("A2", "A6", "U1"),
    oracle="""
        SELECT CAST(ts AS DATE) AS event_date,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events
        GROUP BY CAST(ts AS DATE)
    """,
)
def incremental_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count maintenance across increments: COUNT(DISTINCT)
    is NOT algebraic (you cannot sum two distinct counts), so the
    partial state is the distinct-key SET per group; merging unions the
    sets and sizes the result — split by the same cutoff as
    incremental_rollup_merge and proven against a from-scratch
    COUNT(DISTINCT) oracle.

    Scale: exact set-union partials are the right call when per-group
    key cardinality is bounded (here: users/day); for unbounded keys
    the same merge shape swaps the set for an HLL sketch
    (hll_sketch_agg / hll_union — the approx_count_distinct family)
    at O(1) state per group. The count aggregate rides along to show
    algebraic and set-merge aggregates folding in one pass."""
    events = load(spark, sf_dir, "events").select("ts", "user_id")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.to_date("ts").alias("event_date")).agg(
            F.collect_set("user_id").alias("user_set"),
            F.count(F.lit(1)).alias("n_events"),
        )

    base = partial(events.filter(F.col("ts") < cutoff))
    delta = partial(events.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_date")
        .agg(
            F.size(
                F.array_distinct(F.flatten(F.collect_list("user_set")))
            ).cast("long").alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


@register(
    "incremental_hll_merge",
    ops=("A2", "U1"),
    oracle="""
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_estimate,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY CAST(ts AS DATE)
    """,
)
def incremental_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch form of incremental_distinct_merge: per-day HLL
    sketches (hll_sketch_agg) as partial state, merged across the
    base/delta increments with hll_union_agg and sized with
    hll_sketch_estimate — O(sketch) state per group regardless of key
    cardinality, the only viable distinct-maintenance shape at 100 TB.

    Oracle contract (closes the VERDICT r09 #1 gap): the datasketches
    HLL with the default lgConfigK=12 stays in sparse (coupon-list)
    mode — and is therefore EXACT, not approximate — until a group's
    distinct count reaches the hundreds; both gate scales are deep in
    that regime (per-day users: ≤20 at sf0.001, ≤150 at sf0.01;
    verified equal to COUNT(DISTINCT) at both, first deviation at
    sf0.1's ~1,330/day). The DuckDB twin is the exact count; the
    merge path across base/delta increments must reproduce it bit-for-
    bit or the hash gate fails. tests/test_plans.py pins the same
    sparse-exactness so a testdata regeneration that leaves the
    sparse regime is caught locally before burning a driver slot."""
    events = load(spark, sf_dir, "events").select("ts", "user_id")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.to_date("ts").alias("event_date")).agg(
            F.hll_sketch_agg("user_id").alias("user_sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )

    base = partial(events.filter(F.col("ts") < cutoff))
    delta = partial(events.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_date")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("user_sketch")
            ).alias("n_users_estimate"),
            F.sum("n_events").alias("n_events"),
        )
    )


JOIN_CUTOFF_A = "1997-01-01 00:00:00"  # orders delta boundary (o_orderdate)
JOIN_CUTOFF_B = "1997-06-01 00:00:00"  # lineitem delta boundary (l_shipdate)


@register(
    "incremental_join_merge",
    ops=("J2", "U1", "A1", "E7"),
    oracle=f"""
        SELECT l.l_returnflag, l.l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {sql_fixed_sum("l.l_quantity")} AS sum_qty,
               {sql_fixed_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag, l.l_linestatus
    """,
)
def incremental_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view by delta-join algebra:
    with orders split at JOIN_CUTOFF_A into (A0, dA) and lineitem at
    JOIN_CUTOFF_B into (B0, dB), the refreshed view is the stored
    state A0><B0 plus exactly three delta terms dA><B0, A0><dB and
    dA><dB — disjoint because the splits partition each input, so the
    union is duplicate-free by construction and must equal the
    from-scratch join (the oracle). This is X1/X2 lifted from
    single-table appends to a two-table view — the algebra an
    incremental dbt model or a materialized-view engine applies.

    Scale: the whole point — the A0><B0 term is the STORED view (here
    recomputed to make the query self-contained; a real refresh reads
    it back), so refresh cost is the three delta joins, each with one
    small side (the delta) that broadcasts. The final rollup merges
    partial aggregates across the union's branches; at 100 TB the
    stored state and both deltas share the orderkey bucketing, so the
    delta joins co-locate without a shuffle of the big sides.
    """
    cut_a = F.lit(JOIN_CUTOFF_A).cast("timestamp")
    cut_b = F.lit(JOIN_CUTOFF_B).cast("timestamp")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    )
    a0 = orders.filter(F.col("o_orderdate") <= cut_a)
    da = orders.filter(F.col("o_orderdate") > cut_a)
    b0 = li.filter(F.col("l_shipdate") <= cut_b)
    db = li.filter(F.col("l_shipdate") > cut_b)

    def term(o: DataFrame, l: DataFrame) -> DataFrame:
        return l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
        )

    stored = term(a0, b0)  # the materialized state a real refresh reads back
    refreshed = (
        stored.unionByName(term(da, b0))
        .unionByName(term(a0, db))
        .unionByName(term(da, db))
    )
    return refreshed.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        fixed_sum("l_quantity").alias("sum_qty"),
        fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


from martian_moments_spark.functions.sketches import (  # noqa: E402
    hist_build,
    hist_merge,
    hist_quantile,
    sql_hist_bin,
)
from martian_moments_spark.plans.queries_analytics import (  # noqa: E402
    _HQ_HI,
    _HQ_LO,
    _sql_hist_quantile,
)

# range constants shared with quantile_sketch_accuracy — one sketch,
# two queries (accuracy grading + incremental maintenance)
_IQ_LO, _IQ_HI = _HQ_LO, _HQ_HI
_IQ_CUTOFF = "1999-01-01 00:00:00"  # base vs delta boundary (o_orderdate)


@register(
    "incremental_quantile_merge",
    ops=("A1", "U1", "W2", "O1"),
    oracle=f"""
        WITH u AS (
            SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pu,
                   o_orderdate
            FROM orders
        ), base_h AS (
            SELECT o_orderpriority, {sql_hist_bin("pu", _IQ_LO, _IQ_HI)} AS bin,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM u WHERE o_orderdate < TIMESTAMP '{_IQ_CUTOFF}'
            GROUP BY o_orderpriority, {sql_hist_bin("pu", _IQ_LO, _IQ_HI)}
        ), delta_h AS (
            SELECT o_orderpriority, {sql_hist_bin("pu", _IQ_LO, _IQ_HI)} AS bin,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM u WHERE o_orderdate >= TIMESTAMP '{_IQ_CUTOFF}'
            GROUP BY o_orderpriority, {sql_hist_bin("pu", _IQ_LO, _IQ_HI)}
        ), merged AS (
            SELECT o_orderpriority, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM (SELECT * FROM base_h UNION ALL SELECT * FROM delta_h)
            GROUP BY o_orderpriority, bin
        ), hcum AS (
            SELECT o_orderpriority, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) - cnt AS cum_prev,
                   SUM(cnt) OVER (PARTITION BY o_orderpriority) AS total
            FROM merged
        ), e50 AS ({_sql_hist_quantile(0.5)}), totals AS (
            SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_orders
            FROM merged GROUP BY o_orderpriority
        )
        SELECT t.o_orderpriority, t.n_orders,
               a.est_units / 100.0 AS est_p50
        FROM totals t JOIN e50 a ON t.o_orderpriority = a.o_orderpriority
        ORDER BY t.o_orderpriority
    """,
)
def incremental_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained percentiles: the base corpus's
    histogram sketch merges with a new batch's sketch (cell-wise BIGINT
    sum — never reprocessing the base rows), then estimates the median
    per priority. This is the sketch from quantile_sketch_accuracy
    doing its actual job: where incremental_hll_merge must settle for
    a rows-only check (HLL registers aren't SQL-expressible), the
    histogram sketch is pure integers, so the WHOLE incremental path —
    base build, delta build, merge, estimate — hash-matches the
    oracle. Mergeability == build-of-union is additionally pinned in
    test_sketches.py.

    Scale: each side is one (group, bin) aggregate with map-side
    combine; the merge touches at most groups*256 cells; the base's
    cells would live in the lakehouse (a few KB) while deltas stream
    in — the 100 TB percentile dashboard never re-sorts history."""
    u = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pu"),
        "o_orderdate",
    )
    cutoff = F.lit(_IQ_CUTOFF).cast("timestamp")
    base_h = hist_build(
        u.filter(F.col("o_orderdate") < cutoff),
        "pu",
        _IQ_LO,
        _IQ_HI,
        group_cols=("o_orderpriority",),
    )
    delta_h = hist_build(
        u.filter(F.col("o_orderdate") >= cutoff),
        "pu",
        _IQ_LO,
        _IQ_HI,
        group_cols=("o_orderpriority",),
    )
    merged = hist_merge(base_h, delta_h, group_cols=("o_orderpriority",))
    est = hist_quantile(
        merged, 0.5, _IQ_LO, _IQ_HI, group_cols=("o_orderpriority",), out_col="eu50"
    )
    totals = merged.groupBy("o_orderpriority").agg(
        F.sum("cnt").cast("long").alias("n_orders")
    )
    return (
        totals.join(est, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            (F.col("eu50") / 100.0).alias("est_p50"),
        )
        .orderBy("o_orderpriority")
    )


_PIT_CUTOFF = "1999-01-01 00:00:00"  # orders before -> dim version 1, after -> 2


@register(
    "scd2_point_in_time_join",
    ops=("J2", "J6", "A1", "O1"),
    oracle=f"""
        WITH snap1 AS (
            SELECT c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acct_units,
                   c_mktsegment
            FROM customer
        ), snap2 AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % {SCD2_CHANGE_MOD} = 0
                        THEN acct_units * 2 ELSE acct_units END AS acct_units,
                   c_mktsegment
            FROM snap1
        ), changed AS (
            SELECT s1.c_custkey
            FROM snap1 s1 JOIN snap2 s2 USING (c_custkey)
            WHERE s1.acct_units <> s2.acct_units
               OR s1.c_mktsegment <> s2.c_mktsegment
        ), dim AS (
            SELECT c_custkey, acct_units, c_mktsegment,
                   CAST(1 AS INT) AS valid_from, CAST(NULL AS INT) AS valid_to
            FROM snap1 WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
            UNION ALL
            SELECT c_custkey, acct_units, c_mktsegment,
                   CAST(1 AS INT), CAST(2 AS INT)
            FROM snap1 WHERE c_custkey IN (SELECT c_custkey FROM changed)
            UNION ALL
            SELECT c_custkey, acct_units, c_mktsegment,
                   CAST(2 AS INT), CAST(NULL AS INT)
            FROM snap2 WHERE c_custkey IN (SELECT c_custkey FROM changed)
        ), facts AS (
            SELECT o_custkey,
                   CAST(CASE WHEN o_orderdate < TIMESTAMP '{_PIT_CUTOFF}'
                             THEN 1 ELSE 2 END AS INT) AS fact_version,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_units
            FROM orders
        )
        SELECT f.fact_version,
               (f.o_custkey % {SCD2_CHANGE_MOD} = 0) AS is_changed_cust,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(f.price_units) AS DOUBLE) / 100.0 AS revenue,
               CAST(SUM(d.acct_units) AS BIGINT) AS matched_acct_total
        FROM facts f
        JOIN dim d
          ON f.o_custkey = d.c_custkey
         AND d.valid_from <= f.fact_version
         AND (d.valid_to IS NULL OR f.fact_version < d.valid_to)
        GROUP BY f.fact_version, f.o_custkey % {SCD2_CHANGE_MOD} = 0
        ORDER BY fact_version, is_changed_cust
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension: each fact joins
    the dim VERSION that was valid when the fact happened (valid_from
    <= v < valid_to), never the current row — the as-of/temporal read
    every SCD2 warehouse exists to serve. The matched_acct_total
    column proves the semantics: changed customers' version-1 facts
    pick up the original balance, version-2 facts the doubled one;
    joining is_current instead would silently rewrite history.

    Scale: an equi-join on the customer key with the validity interval
    as a residual predicate (pinned shape: never a theta join); the
    dim carries at most versions-per-key rows, and at 100 TB the
    is_current/closed split is a partition key so current-only reads
    prune history entirely."""
    from martian_moments_spark.operators.relational import scd2_apply_snapshot

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_units"),
        "c_mktsegment",
    )
    dim0 = cust.select(
        "c_custkey",
        "acct_units",
        "c_mktsegment",
        F.lit(1).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    snap2 = cust.withColumn(
        "acct_units",
        F.when(
            F.col("c_custkey") % SCD2_CHANGE_MOD == 0, F.col("acct_units") * 2
        ).otherwise(F.col("acct_units")),
    )
    dim = scd2_apply_snapshot(
        dim0, snap2, keys=["c_custkey"], attrs=["acct_units", "c_mktsegment"], version=2
    )
    facts = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit(_PIT_CUTOFF).cast("timestamp"), 1
        )
        .otherwise(2)
        .cast("int")
        .alias("fact_version"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_units"),
    )
    j = facts.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("fact_version"))
        & (F.col("valid_to").isNull() | (F.col("fact_version") < F.col("valid_to"))),
    )
    return (
        j.groupBy(
            "fact_version",
            (F.col("o_custkey") % SCD2_CHANGE_MOD == 0).alias("is_changed_cust"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum("price_units").cast("double") / 100.0).alias("revenue"),
            F.sum("acct_units").cast("long").alias("matched_acct_total"),
        )
        .orderBy("fact_version", "is_changed_cust")
    )


# ---------------------------------------------------------------------------
# Mergeable uniform sample (bottom-k by hash)
# ---------------------------------------------------------------------------

SAMPLE_K = 100  # sample size maintained across increments


@register(
    "incremental_sample_merge",
    ops=("O2", "U1", "P4"),
    oracle=f"""
        SELECT event_id, user_id, sample_key
        FROM (
            SELECT event_id, user_id,
                   {sql_portable_hash31("'sample:' || CAST(event_id AS VARCHAR)")}
                       AS sample_key
            FROM events
            ORDER BY sample_key, event_id
            LIMIT 100
        )
    """,
)
def incremental_sample_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-sample maintenance across increments: the bottom-k
    events by a deterministic per-row hash ARE a uniform sample
    (order statistics of a uniform key), and the state is mergeable —
    bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)), because any
    of the union's k smallest keys is among its own increment's k
    smallest. The query computes per-increment bottom-k partials
    (split at the incremental family's ROLLUP_CUTOFF watermark),
    merges them, and is proven by hash parity against a from-scratch
    bottom-k oracle over all events — the merge law, not just the
    sample, is what the gate checks. Completes the mergeable-state
    family: rollup (algebraic), distinct set, HLL sketch, quantile
    histogram, and now a uniform sample.

    Scale: each partial is a distributed top-k (per-partition local
    top-k, then a k-row merge — never a global sort); merged state is
    2k rows. The (hash, event_id) order is total, so membership is
    deterministic on any engine."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    key = portable_hash31(
        F.concat(F.lit("sample:"), F.col("event_id").cast("string"))
    )
    keyed = ev.withColumn("sample_key", key)
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.orderBy("sample_key", "event_id").limit(SAMPLE_K)

    base = partial(keyed.filter(F.col("ts") < cutoff))
    delta = partial(keyed.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .orderBy("sample_key", "event_id")
        .limit(SAMPLE_K)
        .select("event_id", "user_id", "sample_key")
    )


from martian_moments_spark.llmops.dedup import (  # noqa: E402
    HASH_P,
    MINHASH_SEEDS,
    minhash_from_hashes,
)
from martian_moments_spark.llmops.textops import (  # noqa: E402
    sql_portable_hash31 as _sql_h31,
    word_shingles,
)


def _sql_source_minhash_cols() -> str:
    return ",\n               ".join(
        f"MIN(list_min(list_transform(s, x -> ({a} * {_sql_h31('x')} + {b}) % {HASH_P}))) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_SEEDS)
    )


@register(
    "incremental_minhash_merge",
    ops=("A4", "U1", "A6"),
    oracle=f"""
        WITH toks AS (
            SELECT source, list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t
            FROM documents
        ), sh AS (
            SELECT source,
                   list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                  i -> t[i] || ' ' || t[i + 1]) AS s
            FROM toks
        )
        SELECT source,
               {_sql_source_minhash_cols()}
        FROM sh GROUP BY source
    """,
)
def incremental_minhash_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-sketch maintenance across increments: the signature of
    a UNION is the element-wise MIN of the parts' signatures —
    minhash's defining mergeability (the same law HLL exploits for
    counts). The Spark side computes per-(source, shard) PARTIAL
    signatures (shard = doc_id parity, standing in for yesterday's
    sketch + today's delta) and merges them with a second MIN; the
    oracle computes each source's signature from scratch over all
    docs. Equality proves partial-merge == full recompute, so a grown
    corpus updates its dedup index without re-reading history.

    Scale: per-doc signatures are narrow per-row array math; the
    partial aggregate combines map-side, the merge aggregate moves 8
    BIGINTs per (source, shard). Documents with <2 tokens yield NULL
    signatures and drop out of MIN like empty sets — both engines
    agree.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    from martian_moments_spark.llmops.textops import portable_hash31 as _h31

    hashed = docs.withColumn(
        "__sh", F.transform(word_shingles("text"), _h31)
    )
    per_doc = hashed.select(
        "source",
        (F.col("doc_id") % 2).alias("__shard"),
        *minhash_from_hashes(F.col("__sh")),
    )
    partial = per_doc.groupBy("source", "__shard").agg(
        *[F.min(f"mh_{i}").alias(f"mh_{i}") for i in range(len(MINHASH_SEEDS))]
    )
    return partial.groupBy("source").agg(
        *[F.min(f"mh_{i}").alias(f"mh_{i}") for i in range(len(MINHASH_SEEDS))]
    )
