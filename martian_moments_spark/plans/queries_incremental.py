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
