"""Streaming sources: file-arrival JSON and Kafka wrappers.

File-arrival replaces the reference's MinIO bucket-notification →
Kafka `minio-events` hop (docker-compose.yml:157-160,186-193): Spark's
file source discovers new objects under the prefix itself and its
checkpoint is the exactly-once event log — no broker in the load path
(SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Control-message schemas for the three reference topics
# (src/config.py:18-20; shapes from src/utils/kafka.py:9-24,
# src/utils/snowflake.py:61-65,104-111).
MINIO_EVENT_SCHEMA = "Key STRING, EventName STRING"
LOAD_COMPLETE_SCHEMA = "tmp_jsonl_staging_path STRING, status STRING, timestamp STRING"
SCHEDULE_SCHEMA = (
    "ingestion_schedule STRUCT<tasks: ARRAY<STRUCT<rover_name: STRING, sol: BIGINT>>, "
    "sol_range: ARRAY<BIGINT>>, status STRING, timestamp STRING"
)


def file_json_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines file-arrival stream over an object-store prefix.

    An explicit schema is mandatory (streaming cannot infer), which is
    also the silver contract: bad records surface as nulls under
    PERMISSIVE mode rather than failing the stream — the reference's
    ON_ERROR='CONTINUE' (src/utils/snowflake.py:50).

    ``max_files_per_trigger`` bounds micro-batch size — the analog of
    the reference's BATCH_SIZE=200 round cap (src/config.py:32)."""
    reader = spark.readStream.schema(schema).option("mode", "PERMISSIVE")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


#: The column contract Spark's Kafka source emits (spark-sql-kafka's
#: fixed output schema). Everything downstream of .load() in this
#: engine is written against THESE columns only, so the file-backed
#: fake below is substitutable for the real source in tests.
KAFKA_SOURCE_FIELDS: tuple[tuple[str, str], ...] = (
    ("key", "binary"),
    ("value", "binary"),
    ("topic", "string"),
    ("partition", "int"),
    ("offset", "bigint"),
    ("timestamp", "timestamp"),
    ("timestampType", "int"),
)


def parse_kafka_frame(raw: DataFrame, value_schema: StructType | str) -> DataFrame:
    """Kafka records → parsed control messages: the reference's
    topic-routed consumer parse (src/utils/kafka.py:5-24). Shared by
    the real source (kafka_stream) and the file-backed contract fake
    (kafka_contract_stream), so the tested parse path IS the
    production parse path."""
    return raw.select(
        F.col("topic"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("msg"),
    ).select("topic", "kafka_ts", "msg.*")


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: StructType | str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic → parsed control-message DataFrame: the reference's
    topic-routed consumer (src/utils/kafka.py:5-24) as a declarative
    source. Requires the spark-sql-kafka package on the classpath (not
    present in this container — the post-.load() pipeline is exercised
    end-to-end against kafka_contract_stream in test_streaming.py)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_frame(raw, value_schema)


def kafka_contract_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed micro-batch stream honoring the Kafka source
    contract: JSONL files under ``path`` carry (topic, key, value,
    partition, offset, timestamp) records — one file ≈ one broker
    poll — and the returned frame has exactly the real source's
    columns and types (KAFKA_SOURCE_FIELDS), so every downstream
    stage (parse_kafka_frame, topic routing, foreachBatch sinks) runs
    unmodified against it. This is the E1-E3 integration seam for
    environments without a broker; swapping in the real source is the
    one .load() line."""
    json_schema = (
        "key STRING, value STRING, topic STRING, partition INT, "
        "offset BIGINT, timestamp TIMESTAMP, timestampType INT"
    )
    raw = file_json_stream(spark, path, json_schema, max_files_per_trigger)
    return raw.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
        F.coalesce(F.col("timestampType"), F.lit(0)).alias("timestampType"),
    )


def kafka_sink_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Shape a DataFrame for the Kafka sink: all payload columns JSON-
    serialized into `value` (the reference's producer json.dumps,
    src/utils/kafka.py:42-57)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns if c != key_col]))
    cols = [payload.alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)
