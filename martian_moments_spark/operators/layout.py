"""Table layout: the Snowflake ``cluster_by`` analog (SURVEY X4).

The reference declares cluster_by=['rover_id','sol','earth_date'] etc.
on every materialized model (flat_photo_response.sql:5) and lets
Snowflake micro-partition. The Spark equivalent is explicit:
partition directories for pruning + within-file sort for row-group
skipping (parquet min/max stats) + bucketing for co-located joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def clustered_write(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_by: Sequence[str] = (),
    files_per_partition: int = 1,
) -> None:
    """Write with the cluster_by layout: directory partitions on the
    coarse key (→ Catalyst partition pruning on equality/range
    predicates), rows sorted within files on the fine key (→ parquet
    row-group min/max skipping). ``files_per_partition`` sizes output
    files — at 100 TB aim for 128-512 MB files, here 1 file per
    partition keeps the test layout readable."""
    out = df
    if partition_by:
        out = out.repartition(files_per_partition, *partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*[*partition_by, *sort_by])
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
) -> None:
    """Bucketed saveAsTable: both sides of a recurring equi-join
    bucketed on the key join WITHOUT a shuffle (the reference's
    co-clustered fact joins, and this engine's 100 TB answer for
    lineitem⋈orders-shaped joins)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: Sequence[str] = (),
) -> dict:
    """Bin-packing small-file compaction (the OPTIMIZE half of a
    lakehouse maintenance cycle). Streaming/incremental appends (E7)
    accrete one file per micro-batch; scans then pay per-file open +
    footer-read + task-schedule overhead, which at 100 TB dominates.
    Rewrite the table into ceil(total_bytes / target_bytes) files
    (per partition directory when ``partition_by`` is set), then swap
    directories so readers never see a half-written table.

    Returns {files_before, files_after, bytes_total}. The swap is
    rename-based: atomic on a POSIX filesystem; on an object store
    run it through the table format's transaction log instead.
    """
    import math
    import os
    import shutil

    def _data_files(root: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
        return out

    before = _data_files(path)
    bytes_total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(bytes_total / target_bytes))
    df = spark.read.parquet(path)

    tmp = path.rstrip("/") + ".__compact_tmp__"
    if partition_by:
        # one shuffle keyed on the partition columns: rows for a
        # directory land together, n_files output files per directory.
        out = df.repartition(n_files, *[*partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        # coalesce, not repartition: narrowing to n_files needs no shuffle.
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    bak = path.rstrip("/") + ".__compact_bak__"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes_total": bytes_total,
    }


def z_value(a, b, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns — the
    multi-dimension clustering key the reference approximates with
    composite cluster_by (flat_photo_response.sql:5: rover_id, sol,
    earth_date). Sorting files by z-value keeps points close in BOTH
    dimensions close on disk, so parquet min/max row-group stats prune
    2-D range predicates that a lexicographic sort only prunes on its
    leading column."""
    from functools import reduce

    from pyspark.sql import functions as F

    # widen to 64-bit BEFORE shifting: interleaving 16-bit inputs needs
    # bit positions up to 31, which overflows IntegerType shifts.
    ca = (a if not isinstance(a, str) else F.col(a)).cast("long")
    cb = (b if not isinstance(b, str) else F.col(b)).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).cast("long")
