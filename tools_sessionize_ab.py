#!/usr/bin/env python
"""A/B for the stateful_sessionize optimization attempt (VERDICT r07
Next-round #4): the operator had never had a measured optimization try
against its ~212k rows/s ceiling (STREAM_SCALE.md). Four arms at the
same offered load as the smoke (200k rows/s, 10k keys, 40 s each):

  shipped        — the repo's per-event Python loop (streaming/
                   stateful.py), default ASAP trigger
  vectorized     — experimental numpy diff segment scan + single
                   datetime64[us] close-frame per invocation (defined
                   HERE, not shipped: it measured 0.92x at the default
                   trigger and no reliable win at 5 s across 3 runs)
  shipped_5s     — shipped function under a 5 s processingTime
                   trigger: fewer, bigger micro-batches amortize the
                   per-group dispatch that dominates this operator
  vectorized_5s  — the experimental function at the same trigger

Appends/refreshes the A/B section in STREAM_SCALE.md. Run on an
otherwise idle machine (same hygiene as the smoke).
"""
from __future__ import annotations

import functools
import json
import shutil
import sys
import tempfile
import time
from collections.abc import Iterator
from typing import Any

import pandas as pd

sys.path.insert(0, ".")
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402

from martian_moments_spark.session import get_spark  # noqa: E402
from martian_moments_spark.streaming.stateful import (  # noqa: E402
    SESSION_OUTPUT_SCHEMA,
    SESSION_STATE_SCHEMA,
    streaming_sessionize,
)
from tools_stream_smoke import rate_events  # noqa: E402

AB_MARK = "## stateful_sessionize optimization A/B (r08)"


def _close_frame(user_id, sessions) -> pd.DataFrame:
    import numpy as np

    arr = np.asarray(sessions, dtype=np.int64).reshape(-1, 3)
    return pd.DataFrame(
        {
            "user_id": np.full(arr.shape[0], user_id, dtype=np.int64),
            "session_start": arr[:, 0].astype("datetime64[us]"),
            "session_end": arr[:, 1].astype("datetime64[us]"),
            "n_events": arr[:, 2],
        }
    )


def _sessionize_vectorized(
    gap_us: int, key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """The experimental arm: numpy diff finds candidate session breaks
    in the sorted event times; the one non-monotonic element — the
    OPEN session's end, which can exceed early late-but-allowed events
    — is handled by keeping only breaks past open_end + gap, which
    reproduces the sequential rule `t > max(open_end, prev_ts) + gap`
    exactly. All closed sessions leave in ONE DataFrame. Output is
    row-identical to the shipped loop (checked by the streaming test
    suite when this arm briefly shipped during r08)."""
    import numpy as np

    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield _close_frame(user_id, [(start_us, end_us, n)])
        return

    parts = [pdf["ts"].astype("int64").to_numpy() // 1000 for pdf in pdfs]
    ts = np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    open_s = list(state.get) if state.exists else None

    closed: list = []
    if ts.size:
        brk = np.flatnonzero(ts[1:] - ts[:-1] > gap_us) + 1
        merge_first = open_s is not None and ts[0] <= open_s[1] + gap_us
        if open_s is not None:
            brk = brk[ts[brk] > open_s[1] + gap_us]
        bounds = np.concatenate((brk, [ts.size]))
        segs = []
        prev = 0
        for b in bounds:
            segs.append((int(ts[prev]), int(ts[b - 1]), int(b - prev)))
            prev = int(b)
        if open_s is not None:
            if merge_first:
                s0 = segs.pop(0)
                open_s = [open_s[0], max(open_s[1], s0[1]), open_s[2] + s0[2]]
            if segs:
                closed.append(tuple(open_s))
                open_s = None
        if segs:
            closed.extend(segs[:-1])
            open_s = list(segs[-1])

    if open_s is None:
        if closed:
            yield _close_frame(user_id, closed)
        return
    wm_ms = state.getCurrentWatermarkMs()
    timeout_ms = (open_s[1] + gap_us) // 1000
    if timeout_ms <= wm_ms:
        closed.append(tuple(open_s))
        state.remove()
    else:
        state.update(tuple(open_s))
        state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield _close_frame(user_id, closed)


def vectorized_sessionize(stream_df, gap_minutes=10, watermark="15 minutes"):
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            functools.partial(_sessionize_vectorized, gap_minutes * 60_000_000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def measure_trigger(name, df, run_seconds=40, trigger=None):
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_ab_{name}_")
    w = df.writeStream.outputMode("append").format("noop").option(
        "checkpointLocation", ckpt
    ).queryName(name)
    if trigger:
        w = w.trigger(processingTime=trigger)
    q = w.start()
    try:
        time.sleep(run_seconds)
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    rates = [
        p["processedRowsPerSecond"] for p in prog[1:] if p.get("numInputRows", 0) > 0
    ]
    res = {
        "rows_per_sec": round(sum(rates) / max(len(rates), 1)),
        "batches": len(rates),
    }
    print(json.dumps({name: res}), flush=True)
    return res


def main() -> None:
    spark = get_spark(app_name="mm-sessionize-ab")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    ev = lambda: rate_events(spark, rate=200_000, n_keys=10_000).select(  # noqa: E731
        "user_id", "ts"
    )
    out = {
        "shipped": measure_trigger("ab_shipped", streaming_sessionize(ev(), gap_minutes=10)),
        "vectorized": measure_trigger("ab_vectorized", vectorized_sessionize(ev())),
        "shipped_5s": measure_trigger(
            "ab_shipped_5s", streaming_sessionize(ev(), gap_minutes=10), trigger="5 seconds"
        ),
        "vectorized_5s": measure_trigger(
            "ab_vectorized_5s", vectorized_sessionize(ev()), trigger="5 seconds"
        ),
    }
    base = out["shipped"]["rows_per_sec"] or 1
    section = (
        f"\n{AB_MARK}\n\n"
        "One measured attempt against the operator's dispatch-bound\n"
        "ceiling (`python tools_sessionize_ab.py`, 200k rows/s offered,\n"
        "10k keys, 40 s each, same harness as the smoke). Arms: the\n"
        "shipped per-event Python loop vs an experimental numpy\n"
        "segment-scan function, each at the default ASAP trigger and\n"
        "at a 5 s processingTime trigger:\n\n"
        "| arm | rows/s | batches | vs shipped |\n"
        "|---|---|---|---|\n"
        + "".join(
            f"| `{k}` | {v['rows_per_sec']:,} | {v['batches']} "
            f"| {v['rows_per_sec'] / base:.2f}x |\n"
            for k, v in out.items()
        )
        + "\nVerdict (3 recorded runs, 2026-08-15): at the default\n"
        "trigger the operator is DISPATCH-bound (~20 events per group\n"
        "per batch) — numpy vectorization adds fixed per-call cost and\n"
        "measured 0.92x consistently, so the per-event loop stays\n"
        "shipped and function-level micro-optimization is recorded as\n"
        "do-not-retry (stateful.py docstring). The measured lever is\n"
        "MICRO-BATCH SIZING: a 5 s processingTime trigger gained\n"
        "~1.5x (best 317k rows/s) by amortizing per-group Arrow\n"
        "transfer + pandas dispatch; the 5 s arms of the two functions\n"
        "are within single-run noise of each other (observed 254-355k).\n"
        "The remaining gap to the JVM built-in is inherent to arbitrary\n"
        "Python state. Operate streaming_sessionize with seconds-scale\n"
        "triggers; use session_window when the output is plain\n"
        "per-session aggregates.\n"
    )
    with open("STREAM_SCALE.md") as f:
        doc = f.read()
    cut = doc.find(AB_MARK)
    if cut != -1:
        doc = doc[: doc.rfind("\n", 0, cut)]
    with open("STREAM_SCALE.md", "w") as f:
        f.write(doc + section)
    print(json.dumps({"sessionize_ab": out}))
    spark.stop()


if __name__ == "__main__":
    main()
