#!/usr/bin/env python
"""Streaming throughput smoke: the engine's Structured Streaming shapes
under a saturating rate source on local[32].

Batch-mode semantics of these operators are oracle-checked in
plans.queries_streaming; tests/test_streaming.py proves correctness on
small files. This tool is the missing third leg — sustained THROUGHPUT
and bounded STATE, measured from the engine's own progress metrics
(processedRowsPerSecond, stateOperators.numRowsTotal), not asserted.

Shapes (each ~20 s against a 2M rows/s rate source):
- tumbling: watermarked 5-minute windows over 20 event types
- session_window: watermarked session merge per user key
- dedup: dropDuplicates within the watermark
- stateful_sessionize: applyInPandasWithState with event-time timeout
  (the custom-operator path; Arrow-batched, state = 1 row/active key) —
  measured at 200k rows/s offered, its own regime: the per-group pandas
  seam is deliberately the slow path, quantified here

Run: python tools_stream_smoke.py   (~2 min; writes STREAM_SCALE.md)
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from martian_moments_spark.session import get_spark  # noqa: E402
from martian_moments_spark.streaming.stateful import streaming_sessionize  # noqa: E402
from martian_moments_spark.streaming.windows import (  # noqa: E402
    dedup_within_watermark,
    watermarked_session_agg,
    watermarked_tumbling_agg,
)

RATE = 2_000_000  # rows/sec offered; observed throughput is the capacity
RUN_SECONDS = 20
N_KEYS = 100_000  # user key domain (bounds stateful state)


def rate_events(spark, rate=RATE, n_keys=N_KEYS):
    """Rate source shaped like the events table: event-time spread over
    the trailing hour so windows/sessions exercise real state, nothing
    falls behind the 2-hour watermark. event_id repeats on a 1M domain
    so dedup holds bounded state AND does real duplicate elimination."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 16)
        .load()
        .select(
            (F.col("timestamp") - (F.col("value") % 3600).cast("int").cast("interval second")).alias("ts"),
            F.concat(F.lit("type"), (F.col("value") % 20).cast("string")).alias("event_type"),
            (F.col("value") % n_keys).alias("user_id"),
            (F.col("value") % 997).cast("double").alias("value"),
            (F.col("value") % 1_000_000).alias("event_id"),
        )
    )


def measure(name, df, out, mode="update", run_seconds=RUN_SECONDS):
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        df.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .queryName(name)
        .start()
    )
    try:
        time.sleep(run_seconds)
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    # steady state: drop the first batch (cold) and empty batches
    rates = [
        p["processedRowsPerSecond"]
        for p in prog[1:]
        if p.get("numInputRows", 0) > 0
    ]
    state = [
        op.get("numRowsTotal", 0)
        for p in prog
        for op in p.get("stateOperators", [])
    ]
    out[name] = {
        "rows_per_sec": round(sum(rates) / max(len(rates), 1)),
        "batches": len(rates),
        "max_state_rows": max(state) if state else 0,
    }
    print(json.dumps({name: out[name]}), flush=True)


def main() -> None:
    spark = get_spark(app_name="mm-stream-smoke")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    out: dict[str, dict] = {}

    ev = rate_events(spark)
    measure("tumbling", watermarked_tumbling_agg(ev, window="5 minutes"), out)
    measure(
        "session_window",
        watermarked_session_agg(ev, gap="10 minutes"),
        out,
        mode="append",
    )
    measure(
        "dedup",
        dedup_within_watermark(ev, id_cols=("event_id",), watermark="2 hours"),
        out,
        mode="append",
    )
    # the Arrow-batched custom stateful operator runs at its own offered
    # rate: per-group pandas overhead caps it well below the built-in
    # operators, which is exactly the seam-vs-builtin gap worth recording
    ev_slow = rate_events(spark, rate=200_000, n_keys=10_000)
    measure(
        "stateful_sessionize",
        streaming_sessionize(ev_slow.select("user_id", "ts"), gap_minutes=10),
        out,
        mode="append",
        run_seconds=40,
    )
    # the SAME business question (user sessions, 10-minute gap) asked
    # of the built-in session_window operator, at the same offered rate
    # and key domain — the apples-to-apples row for the guidance below
    measure(
        "session_window_same_q",
        watermarked_session_agg(
            rate_events(spark, rate=200_000, n_keys=10_000), gap="10 minutes"
        ),
        out,
        mode="append",
        run_seconds=40,
    )

    with open("STREAM_SCALE.md", "w") as f:
        f.write(
            "# STREAM_SCALE — Structured Streaming throughput smoke\n\n"
            "Generated by `python tools_stream_smoke.py`: each shape runs\n"
            f"~{RUN_SECONDS}s against a {RATE:,} rows/s rate source on\n"
            "local[32]; `rows/s` is the mean steady-state\n"
            "processedRowsPerSecond from the engine's own progress metrics\n"
            "(first batch dropped), `state rows` the max stateOperators\n"
            "numRowsTotal — the bounded-state evidence: state tracks the\n"
            "key/window domain, not the row count.\n\n"
            "| shape | rows/s | steady batches | max state rows |\n"
            "|---|---|---|---|\n"
        )
        for name, m in out.items():
            f.write(
                f"| `{name}` | {m['rows_per_sec']:,} | {m['batches']} "
                f"| {m['max_state_rows']:,} |\n"
            )
        ss = out.get("stateful_sessionize", {}).get("rows_per_sec", 0)
        sw_same = out.get("session_window_same_q", {}).get("rows_per_sec", 0)
        sw_cap = out.get("session_window", {}).get("rows_per_sec", 0)
        r_same = round(sw_same / ss, 1) if ss else float("nan")
        r_cap = round(sw_cap / ss, 1) if ss else float("nan")
        f.write(
            "\n## When the built-in session_window suffices\n\n"
            "`stateful_sessionize` and `session_window_same_q` ask the\n"
            "SAME business question — user sessions with a 10-minute\n"
            "inactivity gap — at the same offered rate (200k rows/s)\n"
            "and key domain (10k users). In that overhead-dominated\n"
            "small-batch regime the JVM-state built-in processes\n"
            f"{sw_same:,} rows/s vs {ss:,} ({r_same}x). The regime that\n"
            "matters for sizing is SATURATION: the built-in sustains\n"
            f"{sw_cap:,} rows/s (the `session_window` row, 2M offered)\n"
            f"against the Python-state operator's ~{ss:,} ceiling — a\n"
            f"{r_cap}x capacity gap that is the inherent price of\n"
            "arbitrary Python state (per-group Arrow batch transfer +\n"
            "pandas dispatch), not of this implementation. Reach for\n"
            "`streaming_sessionize` only when the per-session logic\n"
            "cannot be expressed as an aggregation over\n"
            "`F.session_window` — emit-once-on-close payloads with\n"
            "custom shapes, mid-session decision rules, state machines\n"
            "over event sequences. If the output is per-session\n"
            "aggregates (counts, sums, bounds), `watermarked_session_agg`\n"
            "answers it at built-in speed — at 100 TB that capacity gap\n"
            "is the difference between a small streaming job and one\n"
            f"{r_cap}x its executor count.\n"
        )
    print(json.dumps({"stream_smoke": out}))
    spark.stop()


if __name__ == "__main__":
    main()
