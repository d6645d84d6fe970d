#!/usr/bin/env python
"""Cold-protocol A/B for the spread_scan byte-cap (r12 VERDICT #1/#2).

The r11 builder accepted the validation_gaps spread on a warm
interleaved A/B (1.35x) but the driver's COLD protocol (fresh JVM,
2 warm-up passes, median of 3-5) measured it 0.79x and gate-flagged
it. This harness replays the driver's protocol per arm: each
invocation of ``--worker`` is one fresh JVM that runs the named
queries exactly like bench.py (2 warm-ups, median-of-3-to-5 through
the xxhash64-bitxor sink) under one spread configuration; the parent
interleaves arms (A,B,C,A,B,C,...) across subprocesses so host drift
hits every arm equally, then reports per-query median-of-medians.

Arms are spark confs only — the same binary plan builders run in all:
    never   martian.parallelize.spreadScan=never
    uncap   auto + bytesPerSlot=0   (the r11 behavior: target = cores)
    cap     auto + bytesPerSlot default (the r12 byte-capped target)

Usage:
    python tools_r12_coldab.py --reps 3 validation_gaps pricing_summary ...
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

ARMS = {
    "never": {"martian.parallelize.spreadScan": "never"},
    "uncap": {
        "martian.parallelize.spreadScan": "auto",
        "martian.parallelize.bytesPerSlot": "0",
    },
    "cap": {"martian.parallelize.spreadScan": "auto"},
}


def worker(arm: str, names: list[str]) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    from martian_moments_spark.plans import load_all
    from martian_moments_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"mm-r12-coldab-{arm}", extra_conf=ARMS[arm])

    def consume(df):
        cols = [
            F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
            for f in df.schema.fields
        ]
        df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()

    registry = load_all()
    specs = {n: registry[n] for n in names}
    for _ in range(2):
        for spec in specs.values():
            consume(spec.fn(spark, sf_dir))
    out = {}
    for n, spec in specs.items():
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            consume(spec.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        while len(samples) < 5 and min(samples) < 2.0 and samples[-1] < min(samples[:-1]):
            t0 = time.perf_counter()
            consume(spec.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        out[n] = {"median": round(statistics.median(samples), 4), "runs": samples}
    print("COLDAB_RESULT " + json.dumps({"arm": arm, "queries": out}))
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--worker":
        worker(args[1], args[2:])
        return
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args
    results: dict[str, dict[str, list[float]]] = {a: {n: [] for n in names} for a in ARMS}
    for rep in range(reps):
        for arm in ARMS:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", arm, *names],
                capture_output=True, text=True, cwd=HERE,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("COLDAB_RESULT ")),
                None,
            )
            if line is None:
                print(f"rep {rep} arm {arm}: WORKER FAILED", file=sys.stderr)
                print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                continue
            rec = json.loads(line[len("COLDAB_RESULT "):])
            for n, v in rec["queries"].items():
                results[arm][n].append(v["median"])
            print(f"rep {rep} arm {arm}: " +
                  " ".join(f"{n}={v['median']}" for n, v in rec["queries"].items()))
    summary = {
        n: {a: round(statistics.median(results[a][n]), 4) if results[a][n] else None
            for a in ARMS}
        for n in names
    }
    print(json.dumps({"reps": reps, "summary": summary,
                      "all": {a: results[a] for a in ARMS}}, indent=1))
    with open("/tmp/r12_coldab.json", "w") as f:
        json.dump({"reps": reps, "summary": summary, "all": results}, f, indent=1)


if __name__ == "__main__":
    main()
