"""Gap-detection feedback loop (E6) + quality checks (§2.12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from martian_moments_spark.pipelines.feedback import (
    detect_gaps,
    feedback_rounds,
    schedule_envelope,
)
from martian_moments_spark.quality import run_checks, unique_violations


def test_feedback_loop_converges(spark):
    """Manifest says 4 rovers x sols 0..49; actual starts with sols
    0..9 only. With batch_size=30 the loop must converge in ceil(160/30)
    rounds and each envelope must carry tasks + a contiguous range."""
    expected = spark.createDataFrame(
        [(r, s) for r in ("A", "B", "C", "D") for s in range(50)], "rover STRING, sol INT"
    )
    actual = spark.createDataFrame(
        [(r, s) for r in ("A", "B", "C", "D") for s in range(10)], "rover STRING, sol INT"
    )

    def ingest(tasks):
        return spark.createDataFrame(
            [(t["rover"], t["sol"]) for t in tasks], "rover STRING, sol INT"
        )

    final, envelopes = feedback_rounds(
        expected, actual, ["rover", "sol"], ingest, batch_size=30
    )
    assert final.count() == 200
    assert detect_gaps(expected, final, ["rover", "sol"]).count() == 0
    assert len(envelopes) == 6  # ceil(160/30)
    env = envelopes[0]
    assert env["status"] == "generated"
    tasks = env["ingestion_schedule"]["tasks"]
    assert len(tasks) == 30
    rng = env["ingestion_schedule"]["sol_range"]
    assert rng == list(range(min(t["sol"] for t in tasks), max(t["sol"] for t in tasks) + 1))


def test_schedule_envelope_empty():
    env = schedule_envelope([], "sol")
    assert env["status"] == "empty" and env["ingestion_schedule"]["tasks"] == []


def test_quality_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "Perseverance", 5), (2, None, -1), (2, "Sojourner", 3)],
        "id INT, rover STRING, sol INT",
    )
    results = {
        (r.check, r.column): r.violations
        for r in run_checks(
            df,
            not_null=["rover"],
            accepted={"rover": ["Perseverance", "Curiosity", "Opportunity", "Spirit"]},
            expressions={"sol_nonneg": "sol >= 0"},
            unique=[["id"]],
        )
    }
    assert results[("not_null", "rover")] == 1
    assert results[("accepted_values", "rover")] == 1  # Sojourner (NULL not counted twice)
    assert results[("expression_is_true", "sol_nonneg")] == 1
    assert results[("unique", "id")] == 1


def test_quality_checks_clean_table(spark):
    # (synthetic lineitem has no unique compound key — orders carries
    # the unique-key contract here)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    results = run_checks(
        orders,
        not_null=["o_orderkey", "o_custkey"],
        accepted={"o_orderstatus": ["F", "O", "P"]},
        expressions={"price_pos": "o_totalprice >= 0"},
        unique=[["o_orderkey"]],
    )
    assert all(r.passed for r in results), [r for r in results if not r.passed]


def test_unique_violations_counts_extras(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k INT")
    assert unique_violations(df, ["k"]) == 2


def test_observed_gate_counts_in_one_pass(spark, tmp_path):
    """observe()-based gate metrics: the write action itself yields
    total/kept/rejected counts — no second scan of the source."""
    import pyspark.sql.functions as F

    from martian_moments_spark.quality import observed_gate

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("q")
    )
    kept, obs = observed_gate(df, F.col("q") >= 3, name="gate_test")
    out = str(tmp_path / "out")
    kept.write.mode("overwrite").parquet(out)  # the ONLY action
    m = obs.get
    assert m["n_total"] == 100
    assert m["n_kept"] == 70
    assert m["n_rejected"] == 30
    assert spark.read.parquet(out).count() == 70
