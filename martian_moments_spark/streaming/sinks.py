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


#: Name of the derived hash-bucket partition column a merge target is
#: laid out by. It is a physical-layout detail but surfaces in the
#: read-back schema (as any partition column does).
BUCKET_COL = "__part"


def bucket_expr(keys: list[str], num_buckets: int):
    """Deterministic bucket assignment for a merge key: every version
    of a key lands in the same partition, so an upsert only ever needs
    to rewrite the partitions its batch touches."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)).cast("int")


def partitioned_upsert(
    batch_df: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    num_buckets: int = 16,
) -> int:
    """Partition-scoped keyed MERGE — the no-MERGE-on-parquet rewrite
    (X2) that only touches the partitions the batch hits:

    1. dedup the batch on ``keys`` (latest ``order_col`` wins — the
       SURVEY §7.4.2 tie-break) and tag each row's hash bucket;
    2. read ONLY the touched buckets of the target (partition pruning
       on ``__part``) and anti-join out collided keys;
    3. ``localCheckpoint(eager=True)`` the merged frame — durable
       materialization severed from the target's files, so the
       overwrite can never recompute from a half-truncated source
       (cache() is best-effort and is not enough);
    4. dynamic-partition-overwrite: ``mode=overwrite`` +
       ``partitionBy(__part)`` with ``partitionOverwriteMode=dynamic``
       replaces exactly the buckets present in the merged frame —
       untouched buckets' files are not rewritten.

    At 100 TB this bounds a batch's write amplification to
    (touched buckets / num_buckets) of the table instead of 1.0; on a
    real cluster swap localCheckpoint for a reliable checkpoint dir.
    Returns the merged row count.
    """
    from pyspark.sql.window import Window as W

    spark = batch_df.sparkSession
    w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
    batch = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(BUCKET_COL, bucket_expr(keys, num_buckets))
    )
    if os.path.exists(target_path):
        touched = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            return 0
        target = spark.read.parquet(target_path).filter(F.col(BUCKET_COL).isin(touched))
        survivors = target.join(batch.select(*keys), keys, "left_anti")
        merged = batch.unionByName(survivors)
    else:
        merged = batch
    merged = merged.localCheckpoint(eager=True)
    rows = merged.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return rows


def upsert_foreach_batch(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
    num_buckets: int = 16,
    on_batch_complete: Callable[[int, int], None] | None = None,
):
    """Keyed last-writer-wins upsert sink — dbt 'merge' strategy (E8)
    per micro-batch: ``partitioned_upsert`` per batch, then the
    load-complete control record (E9)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        rows = partitioned_upsert(batch_df, target_path, keys, order_col, num_buckets)
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


def cms_sketch_sink(
    stream_df: DataFrame,
    sketch_path: str,
    checkpoint: str,
    key_col: str,
    weight_col: str | None = None,
):
    """Maintain a running count-min sketch over a stream — the
    bounded-memory heavy-hitter summary at unbounded key cardinality
    (functions/sketches.py). Each micro-batch builds its own D x W
    sketch and cell-wise sums it into the persisted grid; because the
    CMS is algebraic (merge == sketch-of-union, pinned in
    test_sketches.py), the running sketch after N batches is exactly
    the sketch of everything that streamed through, regardless of
    batch boundaries.

    foreachBatch is at-least-once and this update is additive, so the
    state is kept in per-batch VERSIONED directories
    (``batch_<id>/`` + Spark's ``_SUCCESS`` marker) rather than one
    overwritten file: a replayed batch re-reads the state as of the
    PREVIOUS batch (never its own partial output — double-count-safe),
    and a crash mid-write leaves only an incomplete dir that the next
    attempt rewrites. The grid is at most D*W rows, so rewriting it
    per batch is a few thousand integers. Read the current grid with
    ``read_cms_sketch``. Returns the started query."""
    from martian_moments_spark.functions.sketches import cms_build, cms_merge

    return algebraic_sketch_sink(
        stream_df,
        sketch_path,
        checkpoint,
        build_fn=lambda df: cms_build(df, key_col, weight_col=weight_col),
        merge_fn=cms_merge,
    )


def hist_sketch_sink(
    stream_df: DataFrame,
    sketch_path: str,
    checkpoint: str,
    units_col: str,
    lo: int,
    hi: int,
    group_cols: tuple[str, ...] = (),
):
    """Maintain running per-group quantile histograms over a stream
    (functions/sketches.py hist_*): the incremental-percentile sink.
    Same versioned-state discipline as the CMS sink; the persisted
    state is at most groups*bins cells. Returns the started query."""
    from martian_moments_spark.functions.sketches import hist_build, hist_merge

    return algebraic_sketch_sink(
        stream_df,
        sketch_path,
        checkpoint,
        build_fn=lambda df: hist_build(df, units_col, lo, hi, group_cols=group_cols),
        merge_fn=lambda a, b: hist_merge(a, b, group_cols=group_cols),
    )


def algebraic_sketch_sink(
    stream_df: DataFrame,
    sketch_path: str,
    checkpoint: str,
    build_fn,
    merge_fn,
):
    """Maintain ANY algebraic summary over a stream: ``build_fn``
    sketches one micro-batch, ``merge_fn`` folds it into the running
    state. Sound whenever merge(sketch(A), sketch(B)) ==
    sketch(A ++ B) — the law all the engine's sketches pin in tests.

    State is per-batch versioned dirs (``batch_<id>/`` + ``_SUCCESS``)
    because foreachBatch is at-least-once and merges are additive: a
    replayed batch reads the state as of the PREVIOUS batch (never its
    own partial output), and a torn write leaves only an incomplete
    dir the retry rewrites. Returns the started query."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sketch = build_fn(batch_df)
        prev_dir = _latest_cms_dir(sketch_path, before=batch_id)
        if prev_dir is not None:
            merged = merge_fn(spark.read.parquet(prev_dir), batch_sketch)
        else:
            merged = batch_sketch
        out_dir = os.path.join(sketch_path, f"batch_{batch_id:020d}")
        merged.coalesce(1).write.mode("overwrite").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def _latest_cms_dir(sketch_path: str, before: int | None = None) -> str | None:
    """Newest COMPLETE (``_SUCCESS``-marked) batch dir, optionally
    restricted to batch ids strictly below ``before`` (the replay
    case: a batch must never read its own prior partial output)."""
    if not os.path.isdir(sketch_path):
        return None
    best = None
    for name in os.listdir(sketch_path):
        if not name.startswith("batch_"):
            continue
        try:
            bid = int(name.split("_", 1)[1])
        except ValueError:
            continue
        if before is not None and bid >= before:
            continue
        if not os.path.exists(os.path.join(sketch_path, name, "_SUCCESS")):
            continue
        if best is None or bid > best[0]:
            best = (bid, name)
    return os.path.join(sketch_path, best[1]) if best else None


def read_cms_sketch(spark, sketch_path: str) -> DataFrame:
    """The current cumulative sketch (latest complete batch version)."""
    d = _latest_cms_dir(sketch_path)
    if d is None:
        raise FileNotFoundError(f"no complete CMS sketch under {sketch_path}")
    return spark.read.parquet(d)
