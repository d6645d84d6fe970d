"""Layout utilities must actually enable pruning — asserted from the
physical plan, not assumed."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from martian_moments_spark.operators.layout import clustered_write


def _explain(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_clustered_write_enables_partition_pruning(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_clustered")
    clustered_write(li, path, partition_by=("l_returnflag",), sort_by=("l_shipdate",))

    dirs = {d for d in os.listdir(path) if d.startswith("l_returnflag=")}
    assert dirs == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}

    filtered = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = _explain(filtered)
    # equality on the partition column must become a PartitionFilter
    # (pruned scan), not a post-scan Filter over all partitions.
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert filtered.count() == li.filter("l_returnflag = 'R'").count()


def test_clustered_write_roundtrip_content(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_rt")
    clustered_write(li, path, partition_by=("l_linestatus",), sort_by=("l_orderkey",))
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_orderkey"), F.sum("l_partkey")).first()
    b = back.agg(F.sum("l_orderkey"), F.sum("l_partkey")).first()
    assert tuple(a) == tuple(b)
