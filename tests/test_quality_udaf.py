"""Pin the applyInPandas EWMA (rows-only query) against a driver-side
recomputation, and the Kafka sink framing shape."""

from __future__ import annotations

import json

from martian_moments_spark.plans import load_all
from martian_moments_spark.streaming.sources import kafka_sink_frame

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_ewma_matches_driver_recomputation(spark):
    df = REGISTRY["ewma_per_user"].fn(spark, SF)
    one_user = sorted(
        [r.asDict() for r in df.filter("user_id = 3").collect()],
        key=lambda r: (r["ts"], r["event_id"]),
    )
    assert one_user, "user 3 missing from sf0.001 events"
    alpha, state = 0.3, None
    for row in one_user:
        state = row["value"] if state is None else alpha * row["value"] + (1 - alpha) * state
        assert abs(row["ewma_value"] - state) < 1e-9


def test_ewma_partitioning_invariant(spark):
    a = REGISTRY["ewma_per_user"].fn(spark, SF)
    b = a.sparkSession.read.parquet(f"{SF}/events.parquet")
    from martian_moments_spark.catalog import load

    ev = load(spark, SF, "events").repartition(13)

    import pandas as pd
    from pyspark.sql import functions as F

    # same computation over a different partitioning must be identical
    got_a = {(r["user_id"], r["event_id"]): r["ewma_value"] for r in a.collect()}

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["ewma_value"] = pdf["value"].ewm(alpha=0.3, adjust=False).mean()
        return pdf[["user_id", "event_id", "ewma_value"]]

    got_b = {
        (r["user_id"], r["event_id"]): r["ewma_value"]
        for r in ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(ewma, "user_id BIGINT, event_id BIGINT, ewma_value DOUBLE")
        .collect()
    }
    assert got_a == got_b


def test_kafka_sink_frame_shape(spark):
    df = spark.createDataFrame([(1, "click", 2.5)], "event_id BIGINT, kind STRING, v DOUBLE")
    framed = kafka_sink_frame(df, key_col="event_id")
    assert framed.columns == ["key", "value"]
    row = framed.first()
    assert row["key"] == "1"
    assert json.loads(row["value"]) == {"kind": "click", "v": 2.5}
