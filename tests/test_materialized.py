"""Materialized rollup maintenance: incremental == full recompute,
append-only detection, fallback through non-append commits."""

from __future__ import annotations

import pytest

from martian_moments_spark import lakehouse as lh
from martian_moments_spark.materialized import MaterializedRollup, MERGES

from pyspark.sql import functions as F


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _mv(tmp_path):
    return MaterializedRollup(
        source_table=str(tmp_path / "src"),
        rollup_table=str(tmp_path / "mv"),
        keys=["k"],
        aggs={
            "total": (F.sum("v"), "sum"),
            "n": (F.count(F.lit(1)), "sum"),  # count partials merge by SUM
            "vmax": (F.max("v"), "max"),
        },
    )


def _expect(spark, mv):
    """Ground truth: the same aggregate recomputed from the full source."""
    return _rows(
        lh.read_table(spark, mv.source_table)
        .groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("vmax"),
        )
    )


def test_incremental_refresh_equals_recompute(spark, tmp_path):
    mv = _mv(tmp_path)
    lh.append(spark.createDataFrame([(0, 10), (1, 5)], "k BIGINT, v BIGINT"), mv.source_table)
    assert mv.refresh(spark)["mode"] == "full"  # first run materializes
    assert _rows(mv.read(spark)) == _expect(spark, mv)

    # two appends -> one incremental refresh covering both
    lh.append(spark.createDataFrame([(0, 7), (2, 1)], "k BIGINT, v BIGINT"), mv.source_table)
    lh.append(spark.createDataFrame([(1, 100)], "k BIGINT, v BIGINT"), mv.source_table)
    out = mv.refresh(spark)
    assert out["mode"] == "incremental" and out["source_version"] == 2
    assert _rows(mv.read(spark)) == _expect(spark, mv)

    # no source movement -> noop
    assert mv.refresh(spark)["mode"] == "noop"


def test_non_append_commit_falls_back_to_full(spark, tmp_path):
    mv = _mv(tmp_path)
    lh.append(spark.createDataFrame([(0, 10)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)
    # an overwrite removes files: the incremental premise is gone
    lh.overwrite(spark.createDataFrame([(0, 1), (5, 2)], "k BIGINT, v BIGINT"), mv.source_table)
    lh.append(spark.createDataFrame([(5, 3)], "k BIGINT, v BIGINT"), mv.source_table)
    out = mv.refresh(spark)
    assert out["mode"] == "full"
    assert _rows(mv.read(spark)) == _expect(spark, mv)
    # subsequent pure appends are incremental again
    lh.append(spark.createDataFrame([(9, 9)], "k BIGINT, v BIGINT"), mv.source_table)
    assert mv.refresh(spark)["mode"] == "incremental"
    assert _rows(mv.read(spark)) == _expect(spark, mv)


def test_non_decomposable_aggregate_rejected(tmp_path):
    with pytest.raises(ValueError, match="avg"):
        MaterializedRollup(
            source_table=str(tmp_path / "s"),
            rollup_table=str(tmp_path / "m"),
            keys=["k"],
            aggs={"a": (F.avg("v"), "avg")},
        )
    assert "avg" not in MERGES  # the rejection is the design, not an accident


def test_many_small_appends_stay_exact(spark, tmp_path):
    """A sequence of tiny appends with overlapping keys — the
    steady-state streaming-ish workload — must stay exactly equal to
    recompute at every refresh."""
    mv = _mv(tmp_path)
    lh.append(spark.createDataFrame([(0, 0)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)
    for i in range(1, 6):
        lh.append(
            spark.createDataFrame([(i % 3, i), (0, -i)], "k BIGINT, v BIGINT"),
            mv.source_table,
        )
        out = mv.refresh(spark)
        assert out["mode"] == "incremental"
        assert _rows(mv.read(spark)) == _expect(spark, mv), f"diverged at append {i}"


def test_watermark_rides_the_rollup_commit(spark, tmp_path):
    """Crash-safety by construction: the watermark lives in the
    rollup's commit entry, so no crash point can separate them — and
    re-running a refresh after a simulated partial failure never
    double-counts."""
    mv = _mv(tmp_path)
    lh.append(spark.createDataFrame([(0, 10)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)
    lh.append(spark.createDataFrame([(0, 5)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)
    entry = lh._read_entry(mv.rollup_table, lh.current_version(mv.rollup_table))
    assert entry["meta"]["source_version"] == 1
    # "crash recovery": calling refresh again is a pure noop — the
    # committed data and its watermark cannot disagree
    assert mv.refresh(spark)["mode"] == "noop"
    assert _rows(mv.read(spark)) == _expect(spark, mv)


def test_vacuumed_source_log_falls_back_to_full(spark, tmp_path):
    """Vacuum expiring the source's delta trail must degrade to a full
    recompute, not crash."""
    mv = _mv(tmp_path)
    lh.append(spark.createDataFrame([(0, 1)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)
    for i in range(2, 5):
        lh.append(spark.createDataFrame([(0, i)], "k BIGINT, v BIGINT"), mv.source_table)
    lh.vacuum(mv.source_table, keep_versions=1, retention_seconds=0)
    out = mv.refresh(spark)
    assert out["mode"] == "full"
    assert _rows(mv.read(spark)) == _expect(spark, mv)


def test_recreated_source_falls_back_to_full(spark, tmp_path):
    """A source rebuilt at the same path (version goes backward) must
    trigger a full recompute, not an empty-range incremental."""
    import shutil

    mv = _mv(tmp_path)
    for i in range(4):
        lh.append(spark.createDataFrame([(i, i)], "k BIGINT, v BIGINT"), mv.source_table)
    mv.refresh(spark)  # watermark = 3
    shutil.rmtree(mv.source_table)
    lh.append(spark.createDataFrame([(9, 90)], "k BIGINT, v BIGINT"), mv.source_table)
    out = mv.refresh(spark)  # source now at v0 < watermark 3
    assert out["mode"] == "full"
    assert _rows(mv.read(spark)) == {(9, 90, 1, 90)}
