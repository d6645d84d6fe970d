#!/usr/bin/env python
"""Headline benchmark runner (driver contract).

Runs every bench-flagged query from the registry against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through a full materialization (count of the
result) so the measured time covers scan -> shuffle -> aggregate, not
plan construction. A warm-up run of the flagship query first pays the
JVM/codegen startup cost once so per-query numbers reflect steady-state
engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402


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
            spec.fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
