#!/usr/bin/env python
"""Headline benchmark runner (driver contract).

Runs every bench-flagged query from the registry against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through a value-consuming sink: every
output column feeds an xxhash64 that is summed to one scalar, so the
measured time covers scan -> shuffle -> aggregate -> expression
evaluation of every result column. (A bare .count() would let Catalyst
prune projections — a projection-only query would time a row count,
not its expressions.) A warm-up pass first pays the JVM/codegen
startup cost so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import MapType  # noqa: E402

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402


def consume(df) -> None:
    """Materialize every output column: hash each row's full width to
    one value, XOR the hashes to a scalar (overflow-free under ANSI
    mode). Nothing prunes — the result depends on every column — and
    nothing large returns to the driver."""
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    spark = get_spark(app_name="mm-spark-bench")
    # Warm-up: JVM JIT (C2 needs repeat executions) + whole-stage-
    # codegen compile + parquet footer caches are one-time costs, not
    # engine throughput — pay them for every plan shape before the
    # measured pass.
    for _ in range(2):
        for spec in bench_specs.values():
            consume(spec.fn(spark, sf_dir))

    # Median of three-to-five measured passes per query, with every
    # pass recorded: a single pass is at the mercy of GC pauses and
    # host jitter, and sub-second queries have tripped the driver's 2x
    # regression line on pure session noise (VERDICT r05 What's-wrong
    # #2). The per-run arrays make the artifact itself carry the
    # noise evidence — the spread IS the error bar. Since r10 the
    # headline estimator is the MEDIAN (VERDICT r09 Next-round #3):
    # best-of-N ratchets toward lucky passes and made round-over-round
    # ratios read as code regressions when they were session noise;
    # the median is noise-robust in both directions. ``best`` rides
    # along per query so historical best-of comparisons stay possible.
    timings: dict[str, float] = {}
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, spec in bench_specs.items():
        samples: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            consume(spec.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        # Sub-second queries dominated by fixed session overhead keep
        # descending past 3 passes (C2 recompiles, broadcast reuse);
        # keep sampling (2 extra max) while the newest pass strictly
        # improved on all prior ones — a tie means the curve has
        # flattened and nothing new can be learned.
        while (
            len(samples) < 5
            and min(samples) < 2.0
            and samples[-1] < min(samples[:-1])
        ):
            t0 = time.perf_counter()
            consume(spec.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 4)
        best[name] = min(samples)

    total = round(sum(timings.values()), 4)
    best_total = round(sum(best.values()), 4)

    # Per-query history: every run appends to BENCH_HISTORY.jsonl, and
    # the current run is compared against the MEDIAN prior time at the
    # same sf (the all-time minimum ratchets low and flags ±40% machine
    # noise every run). Ratios > 1.5x with > 0.3 s absolute delta are
    # reported in the JSON line itself — regressions were previously
    # only findable by hand-diffing BENCH_r{N}.json files.
    #
    # Lineage discipline (ADVICE r10): records written before the r10
    # estimator switch hold BEST-OF times in "queries"; since r10 they
    # hold medians and carry a separate "best" map. Comparing this
    # run's median against a history dominated by best-of rows is
    # biased toward false regression flags (median sits systematically
    # above best-of). So the gate compares like lineages: median vs
    # prior medians when enough median-era rows exist, else this run's
    # BEST against the prior best lineage (old "queries" values are
    # best-of by construction; median-era rows contribute their
    # "best" map).
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")
    prior_med: dict[str, list[float]] = {}
    prior_best: dict[str, list[float]] = {}
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if str(rec.get("sf")) != sf:
                    continue
                median_era = rec.get("passes") == "median-of-3-to-5"
                if median_era:
                    for q, t in rec.get("queries", {}).items():
                        prior_med.setdefault(q, []).append(t)
                for q, t in (rec.get("best") or (rec.get("queries") if not median_era else {}) or {}).items():
                    prior_best.setdefault(q, []).append(t)
    regressions = {}
    for name, t in timings.items():
        if len(prior_med.get(name, [])) >= 2:
            now, m = t, statistics.median(prior_med[name])
            lineage = "median"
        elif prior_best.get(name):
            now, m = best[name], statistics.median(prior_best[name])
            lineage = "best"
        else:
            continue
        if now > 0.3 and now > 1.5 * m and now - m > 0.3:
            regressions[name] = {
                "now": now,
                "median": round(m, 4),
                "ratio": round(now / m, 2),
                "lineage": lineage,
            }
    with open(hist_path, "a") as f:
        f.write(
            json.dumps(
                {
                    "ts": round(time.time(), 1),
                    "sf": sf,
                    "total": total,
                    "queries": timings,
                    "best": best,
                    "best_total": best_total,
                    "runs": runs,
                    # Estimator provenance: records before this field
                    # exists were best-of-2; then best-of-3-to-5
                    # (adaptive); since r10 ``queries`` carries the
                    # MEDIAN of the passes and ``best`` the minimum,
                    # so both lineages stay comparable.
                    "passes": "median-of-3-to-5",
                }
            )
            + "\n"
        )

    # The driver captures a bounded tail of stdout; the headline line
    # must stay compact (BENCH_r06.json went unparsed when per-run
    # arrays pushed it past the capture window). Full per-run evidence
    # lives in BENCH_HISTORY.jsonl, written just above.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "best_total": best_total,
                # Recordings before round 2 used a count() sink that
                # let Catalyst prune projections; cross-sink ratios
                # (e.g. vs BENCH_r01) overstate projection-heavy
                # sub-second queries by construction. Per-query values
                # are medians of 3-5 passes since r10 (was best-of);
                # compare r<=9 per-query numbers against "best_total"
                # lineage, not the median.
                "sink": "xxhash64-bitxor, comparable since r02",
                "estimator": "median-of-3-to-5 passes (since r10)",
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "regressions": regressions,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
