"""Granular unit tests for operators.relational — edge semantics the
oracle-parity queries don't isolate (strict as-of, empty watermark
target, bucket-boundary straddling, dictionary-map defaults)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from martian_moments_spark.operators.relational import (
    anti_join_gaps,
    asof_join,
    broadcast_dim_join,
    bucketed_range_join,
    case_map,
    high_watermark_filter,
    topk_per_group,
)


def test_case_map_values_and_default(spark):
    df = spark.createDataFrame(
        [("Perseverance",), ("Spirit",), ("Sojourner",), (None,)], "rover STRING"
    )
    got = {
        r["rover"]: r["rid"]
        for r in df.select(
            "rover",
            case_map("rover", {"Perseverance": 8, "Spirit": 7}, default=0).alias("rid"),
        ).collect()
    }
    assert got == {"Perseverance": 8, "Spirit": 7, "Sojourner": 0, None: 0}


def test_high_watermark_filter_empty_target_selects_all(spark):
    src = spark.createDataFrame([(i,) for i in range(5)], "wm INT")
    empty = src.filter("wm < 0")
    assert high_watermark_filter(src, empty, "wm").count() == 5
    half = src.filter("wm <= 2")
    got = sorted(r["wm"] for r in high_watermark_filter(src, half, "wm").collect())
    assert got == [3, 4]  # strictly above MAX(target)


def test_broadcast_dim_join_plans_broadcast(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k INT, v DOUBLE")
    dim = spark.createDataFrame([(1, "a")], "k INT, name STRING")
    j = broadcast_dim_join(fact, dim, "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
    assert j.count() == 1


def test_anti_join_gaps_finds_missing_grains(spark):
    expected = spark.createDataFrame([(r, s) for r in "AB" for s in range(3)], "r STRING, s INT")
    actual = spark.createDataFrame([("A", 0), ("A", 1), ("B", 0)], "r STRING, s INT")
    gaps = sorted(tuple(x) for x in anti_join_gaps(expected, actual, ["r", "s"]).collect())
    assert gaps == [("A", 2), ("B", 1), ("B", 2)]


def test_topk_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3), ("h", 1, 1)], "grp STRING, score INT, id INT"
    )
    got = sorted(
        (r["grp"], r["id"])
        for r in topk_per_group(
            df, ["grp"], [F.col("score").desc(), F.col("id")], k=2
        ).collect()
    )
    assert got == [("g", 1), ("g", 2), ("h", 1)]  # id tie-break, not arbitrary


def test_asof_join_strict_excludes_equal_timestamps(spark):
    left = spark.createDataFrame([(1, 10)], "k INT, t INT")
    right = spark.createDataFrame([(1, 10, 100), (1, 5, 50)], "k INT, t INT, v INT")
    inclusive = asof_join(
        left, right, on="k", left_time="t", right_time="t", value_cols=["v"],
        right_tiebreak="v",
    ).first()
    strict = asof_join(
        left, right, on="k", left_time="t", right_time="t", value_cols=["v"],
        strict=True, right_tiebreak="v",
    ).first()
    assert inclusive["asof_v"] == 100  # t=10 row matches at-or-before
    assert strict["asof_v"] == 50  # strictly-before only


def test_asof_join_no_match_yields_null(spark):
    left = spark.createDataFrame([(1, 1)], "k INT, t INT")
    right = spark.createDataFrame([(1, 5, 9)], "k INT, t INT, v INT")
    row = asof_join(
        left, right, on="k", left_time="t", right_time="t", value_cols=["v"],
        right_tiebreak="v",
    ).first()
    assert row["asof_v"] is None


def test_bucketed_range_join_straddles_bucket_boundary(spark):
    # interval spans two day-buckets; points in each bucket must match
    intervals = spark.createDataFrame(
        [("i1", "2024-01-01 18:00:00", "2024-01-02 06:00:00")],
        "iid STRING, s STRING, e STRING",
    ).select(
        "iid", F.col("s").cast("timestamp").alias("s"), F.col("e").cast("timestamp").alias("e")
    )
    points = spark.createDataFrame(
        [(1, "2024-01-01 20:00:00"), (2, "2024-01-02 01:00:00"), (3, "2024-01-02 12:00:00")],
        "pid INT, t STRING",
    ).select("pid", F.col("t").cast("timestamp").alias("t"))
    got = sorted(
        r["pid"]
        for r in bucketed_range_join(points, intervals, "t", "s", "e").collect()
    )
    assert got == [1, 2]  # 3 is outside; both in-window points found


def test_salted_agg_explicit_merge_matches_plain_groupby(spark):
    """Salting must be invisible in the result: explicit (phase1,
    merge) pairs reproduce the unsalted GROUP BY exactly, and a mean
    carried as (sum, count) partials divides to the exact avg."""
    from martian_moments_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(k % 2, k, float(k)) for k in range(100)], "key INT, id BIGINT, v DOUBLE"
    )
    out = salted_agg(
        df,
        keys=["key"],
        aggs={
            "n": (F.count(F.lit(1)), "sum"),
            "v_sum": (F.sum(F.col("v").cast("long")), "sum"),
            "id_min": (F.min("id"), "min"),
            "id_max": (F.max("id"), "max"),
        },
        n_salts=8,
        salt_source="id",
    ).withColumn("v_avg", F.col("v_sum") / F.col("n"))
    plain = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("long")).alias("v_sum"),
        F.min("id").alias("id_min"),
        F.max("id").alias("id_max"),
        F.avg("v").alias("v_avg"),
    )
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_salted_agg_rejects_unmergeable_aggregates(spark):
    """avg partials cannot be re-merged — salted_agg must refuse both
    an unknown merge name and a bare (merge-less) expression instead of
    silently re-summing averages."""
    import pytest

    from martian_moments_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(1, 2.0)], "key INT, v DOUBLE")
    with pytest.raises(ValueError, match="unknown merge 'avg'"):
        salted_agg(df, keys=["key"], aggs={"m": (F.avg("v"), "avg")})
    with pytest.raises(TypeError, match="merge is explicit"):
        salted_agg(df, keys=["key"], aggs={"m": F.avg("v")})


def test_scd2_apply_snapshot_all_transitions(spark):
    """One fold must handle every SCD2 transition: history passthrough,
    unchanged-open, changed (close + reopen), deleted key (close), new
    key (open)."""
    from martian_moments_spark.operators.relational import scd2_apply_snapshot

    dim = spark.createDataFrame(
        [
            # closed history row: must pass through untouched
            (1, "a-old", 1, 2, False),
            # open rows
            (1, "a", 2, None, True),      # unchanged
            (2, "b", 1, None, True),      # attr will change
            (3, "c", 1, None, True),      # key deleted from snapshot
        ],
        "k BIGINT, attr STRING, valid_from INT, valid_to INT, is_current BOOLEAN",
    )
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (4, "d")], "k BIGINT, attr STRING"
    )
    out = scd2_apply_snapshot(dim, snap, keys=["k"], attrs=["attr"], version=3)
    got = {tuple(r) for r in out.collect()}
    assert got == {
        (1, "a-old", 1, 2, False),   # history untouched
        (1, "a", 2, None, True),     # unchanged stays open
        (2, "b", 1, 3, False),       # changed: closed at v3
        (2, "b2", 3, None, True),    # changed: reopened at v3
        (3, "c", 1, 3, False),       # deleted: closed, no reopen
        (4, "d", 3, None, True),     # new key opens at v3
    }


def test_bloom_prefilter_join_matches_plain_join(spark):
    from martian_moments_spark.operators.relational import bloom_prefilter_join

    big = spark.createDataFrame([(k, k * 10) for k in range(100)], "k BIGINT, v BIGINT")
    small = spark.createDataFrame([(3,), (7,), (7,), (42,)], "k BIGINT")
    got = {tuple(r) for r in bloom_prefilter_join(big, small.distinct(), ["k"]).collect()}
    want = {tuple(r) for r in big.join(small.distinct(), ["k"]).collect()}
    assert got == want
    # semi form: one output row per big row, duplicates on small ignored
    semi = bloom_prefilter_join(big, small, ["k"], how="left_semi")
    assert sorted(r["k"] for r in semi.collect()) == [3, 7, 42]


def test_bloom_prefilter_join_rejects_outer(spark):
    import pytest

    from martian_moments_spark.operators.relational import bloom_prefilter_join

    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(df, df, ["k"], how="left")


def test_bloom_prefilter_join_saturated_digest_skips_filter(spark):
    from martian_moments_spark.operators.relational import bloom_prefilter_join

    big = spark.createDataFrame([(k,) for k in range(50)], "k BIGINT")
    small = spark.createDataFrame([(k,) for k in range(50)], "k BIGINT")
    # num_buckets=1: every bucket hit -> the big-side filter must be
    # skipped entirely (no pruning possible), join still exact
    out = bloom_prefilter_join(big, small, ["k"], num_buckets=1)
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        out.explain("formatted")
    assert "xxhash64" not in plan.getvalue()
    assert out.count() == 50


def test_asof_join_tolerance_nulls_stale_matches(spark):
    l = spark.createDataFrame(
        [(1, 10, "a"), (1, 100, "b"), (2, 50, "c")], "k INT, t INT, lid STRING"
    )
    r = spark.createDataFrame([(1, 8, 80), (2, 49, 90)], "k INT, t INT, val INT")
    got = {
        row["lid"]: row["asof_val"]
        for row in asof_join(
            l, r, on="k", left_time="t", right_time="t",
            value_cols=["val"], tolerance=10,
        ).collect()
    }
    # lid a: match at t=8, staleness 2 <= 10 -> kept
    # lid b: match at t=8, staleness 92 > 10 -> NULL
    # lid c: staleness 1 -> kept
    assert got == {"a": 80, "b": None, "c": 90}
