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


#: Commit manifest written inside a fully-written compaction tmp dir.
#: Its presence (with matching file list) marks the tmp as roll-forward
#: safe; its absence marks the tmp as garbage.
COMPACT_MANIFEST = "_COMPACT_COMMIT.json"


def _data_files(root: str) -> list[str]:
    import os

    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


def _tmp_complete(tmp: str) -> bool:
    """True iff the tmp dir carries a commit manifest whose file list
    (relative path + size) matches what is on disk."""
    import json
    import os

    manifest = os.path.join(tmp, COMPACT_MANIFEST)
    if not os.path.exists(manifest):
        return False
    try:
        with open(manifest) as f:
            expected = json.load(f)["files"]
    except (OSError, ValueError, KeyError):
        return False
    actual = {
        os.path.relpath(p, tmp): os.path.getsize(p) for p in _data_files(tmp)
    }
    return actual == {e["path"]: e["size"] for e in expected}


def recover_compaction(path: str) -> str:
    """Repair any state an interrupted compaction left behind. Safe to
    call any time (no-op when clean); compact_small_files calls it on
    entry. Crash windows and their repair:

    - tmp written + manifest committed, table renamed away (crash
      between the two swap renames): roll FORWARD — the tmp is proven
      complete, so it becomes the table and the backup is dropped.
    - tmp present without a valid manifest: the write never finished —
      drop the tmp (and restore the backup if the table is missing).
    - backup + table both present (crash after swap, before cleanup):
      the new table is live — drop the backup.

    Returns one of 'clean', 'rolled_forward', 'rolled_back',
    'dropped_tmp', 'dropped_bak'."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".__compact_tmp__"
    bak = path.rstrip("/") + ".__compact_bak__"
    if os.path.exists(tmp):
        if _tmp_complete(tmp) and not os.path.exists(path):
            os.rename(tmp, path)
            os.remove(os.path.join(path, COMPACT_MANIFEST))
            if os.path.exists(bak):
                shutil.rmtree(bak)
            return "rolled_forward"
        shutil.rmtree(tmp)
        if os.path.exists(bak) and not os.path.exists(path):
            os.rename(bak, path)
            return "rolled_back"
        if os.path.exists(bak):
            shutil.rmtree(bak)
            return "dropped_tmp"
        return "dropped_tmp"
    if os.path.exists(bak):
        if os.path.exists(path):
            shutil.rmtree(bak)
            return "dropped_bak"
        os.rename(bak, path)
        return "rolled_back"
    return "clean"


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

    Crash safety: ``recover_compaction`` runs on entry to repair any
    earlier interrupted run; after the tmp is fully written a commit
    manifest (file list + sizes) is sealed inside it, so a crash
    anywhere in the two-rename swap window is recoverable — manifest
    present → roll forward, absent → roll back. Each individual rename
    is atomic on POSIX; on an object store use the table format's
    transaction log instead.

    Returns {files_before, files_after, bytes_total, recovered}.
    """
    import json
    import math
    import os
    import shutil

    recovered = recover_compaction(path)

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

    files = [
        {"path": os.path.relpath(p, tmp), "size": os.path.getsize(p)}
        for p in sorted(_data_files(tmp))
    ]
    with open(os.path.join(tmp, COMPACT_MANIFEST), "w") as f:
        json.dump({"files": files}, f)

    bak = path.rstrip("/") + ".__compact_bak__"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    os.remove(os.path.join(path, COMPACT_MANIFEST))
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes_total": bytes_total,
        "recovered": recovered,
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


def zorder_write(
    df,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> str:
    """Z-order-clustered parquet write (the OPTIMIZE ZORDER BY analog,
    X4's multi-dimensional form): range-partition rows by their Morton
    z-value into ``n_files`` output files and sort within each file by
    the same value, so every file (and every row group inside it)
    covers a compact region of the (col_a, col_b) plane. Parquet
    footer min/max stats then prune predicates on EITHER column —
    a lexicographic sort only prunes its leading column.

    At 100 TB this is the difference between a b-predicate scanning
    every file and scanning ~sqrt-fraction of them; the z computation
    itself is pure per-row bit math (no shuffle beyond the range
    partition, which a periodic re-cluster amortizes)."""
    from pyspark.sql import functions as F

    out = (
        df.withColumn("__z", z_value(col_a, col_b, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(path)
    return path
