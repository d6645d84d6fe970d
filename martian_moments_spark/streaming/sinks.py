"""Streaming sinks: append + keyed-upsert foreachBatch, with
load-complete control records.

``foreachBatch`` is the micro-batch ≈ DAG-run equivalence (E1): each
batch applies the same deterministic append/upsert semantics as the
incremental layer (queries_incremental), then emits the load-complete
control record the reference publishes to Kafka after every COPY
(src/utils/snowflake.py:61-65, E9).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_parquet_sink(
    stream_df: DataFrame, path: str, checkpoint: str, partition_by: tuple[str, ...] = ()
):
    """Exactly-once append to parquet — dbt 'append' strategy (E7) with
    the checkpoint as the high-watermark. Returns the started query."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.trigger(availableNow=True).start()


def upsert_foreach_batch(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
    on_batch_complete: Callable[[int, int], None] | None = None,
):
    """Keyed last-writer-wins upsert sink — dbt 'merge' strategy (E8)
    per micro-batch:

    1. dedup the batch itself on ``keys`` (latest ``order_col`` wins —
       the SURVEY §7.4.2 tie-break);
    2. merged = batch ∪ (target ⟕anti batch)  — anti-join + union, the
       no-MERGE-on-parquet rewrite (X2);
    3. overwrite the target; 4. emit the load-complete record (E9).

    At 100 TB the target is partitioned by a key prefix and step 3
    rewrites only partitions the batch touches (dynamic partition
    overwrite); here the whole (small) target is rewritten.
    """
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window as W

        w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            survivors = target.join(batch.select(*keys), keys, "left_anti")
            merged = batch.unionByName(survivors)
        else:
            merged = batch
        # Self-overwrite safety: materialize before truncating the dir.
        rows = merged.cache().count()
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()
        write_load_complete(os.path.dirname(target_path), target_path, batch_id, rows)
        if on_batch_complete:
            on_batch_complete(batch_id, rows)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def write_load_complete(control_dir: str, path: str, batch_id: int, rows: int) -> str:
    """Load-complete control record (E9): the reference's
    {tmp_jsonl_staging_path, status, timestamp} Kafka message
    (src/utils/snowflake.py:61-65) as a marker file (a Kafka sink is a
    one-line swap via sources.kafka_sink_frame)."""
    os.makedirs(control_dir, exist_ok=True)
    marker = os.path.join(control_dir, f"_load_complete_{batch_id}.json")
    with open(marker, "w") as f:
        json.dump(
            {
                "path": path,
                "status": "success",
                "rows": rows,
                "batch_id": batch_id,
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
            },
            f,
        )
    return marker
