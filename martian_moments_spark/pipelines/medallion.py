"""Medallion flow: bronze JSON envelopes → silver typed rows → gold
marts (SURVEY §1.1, §3.2-3.3) — the reference's flatten/star/mart
layers re-expressed as three DataFrame stages over an object-store
layout. Works identically in batch (``spark.read``) and streaming
(``file_json_stream``) because the transformations are the same plan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Envelope contract (the reference's batch envelope,
# src/ingestion/photos.py:38-45): one JSON document per line (JSONL —
# what S5 converts to; spark.read.json native).
ENVELOPE_SCHEMA = (
    "filename STRING, event_count BIGINT, ingestion_date STRING, "
    "events ARRAY<STRUCT<event_id: BIGINT, ts: STRING, user_id: BIGINT, "
    "event_type: STRING, value: DOUBLE>>"
)


def write_bronze_envelopes(
    rows: list[dict], bronze_dir: str, batch_size: int = 100, ingestion_date: str = "2024-02-01T00:00:00"
) -> list[str]:
    """Driver-side envelope writer standing in for the reference's
    ingestion fan-in + MinIO put (minio.py:19-46): batches of raw
    events wrapped {filename, event_count, events[], ingestion_date},
    one envelope per JSONL file under the bronze prefix."""
    os.makedirs(bronze_dir, exist_ok=True)
    paths = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        name = f"events_batch_{i // batch_size:05d}.json"
        path = os.path.join(bronze_dir, name)
        with open(path, "w") as f:
            json.dump(
                {
                    "filename": name,
                    "event_count": len(chunk),
                    "ingestion_date": ingestion_date,
                    "events": chunk,
                },
                f,
            )
            f.write("\n")
        paths.append(path)
    return paths


def flatten_envelopes(bronze: DataFrame) -> DataFrame:
    """Silver flatten: one row per array element with explicit typed
    casts — LATERAL FLATTEN + ::casts (flat_photo_response.sql:10-26).
    Carries envelope lineage (filename, ingestion_date) onto every row
    like the reference's silver models do."""
    return bronze.select(
        "filename",
        F.to_timestamp("ingestion_date", "yyyy-MM-dd'T'HH:mm:ss").alias("ingestion_ts"),
        F.explode("events").alias("e"),
    ).select(
        "filename",
        "ingestion_ts",
        F.col("e.event_id").cast("long").alias("event_id"),
        F.to_timestamp(F.col("e.ts")).alias("ts"),
        F.col("e.user_id").cast("long").alias("user_id"),
        F.col("e.event_type").cast("string").alias("event_type"),
        F.col("e.value").cast("double").alias("value"),
    )


def build_gold_daily(silver: DataFrame) -> DataFrame:
    """Gold mart: per-day per-type activity rollup with conditional
    category counts (daily_activity.sql:9-30 shape)."""
    return (
        silver.groupBy(F.col("ts").cast("date").alias("activity_date"))
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("error_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchase_events"
            ),
            F.countDistinct("user_id").alias("active_users"),
            F.max("ingestion_ts").alias("latest_ingestion"),
        )
    )


def run_batch_medallion(
    spark: SparkSession, bronze_dir: str, silver_dir: str, gold_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Batch bronze→silver→gold: read all envelopes, flatten, write
    silver partitioned by event_type (the cluster_by analog, X4),
    aggregate, write gold. Returns (silver, gold) readbacks."""
    bronze = spark.read.schema(ENVELOPE_SCHEMA).json(bronze_dir)
    flatten_envelopes(bronze).write.mode("overwrite").partitionBy("event_type").parquet(
        silver_dir
    )
    silver = spark.read.parquet(silver_dir)
    build_gold_daily(silver).write.mode("overwrite").parquet(gold_dir)
    return silver, spark.read.parquet(gold_dir)
