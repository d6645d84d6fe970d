#!/usr/bin/env python
"""Fixed-overhead decomposition of the sub-1.5 s registry tail
(r12 VERDICT #8): where do the ~0.2-0.3 s per-query floors live —
plan construction (python), analysis+optimization, physical planning,
or execution (codegen + AQE stage scheduling + task run)?

For each named query (default: a 12-query tail sample spanning the
families), after a full warm pass, measures per phase:
    build_ms   spec.fn(spark, sf)         — python plan construction
    opt_ms     qe.optimizedPlan()         — analysis + optimizer
    phys_ms    qe.executedPlan()          — physical planning
    exec_ms    the bench hash-sink consume of a FRESH plan
                (covers codegen, AQE re-planning, job submit, tasks)
Run on a quiet session; output one JSON line per query +
/tmp/r12_overhead.json.
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TAIL_SAMPLE = [
    "dedup_exact",
    "gap_detection_anti_join",
    "merge_upsert",
    "tumbling_window_agg",
    "json_path_extract",
    "pricing_summary",
    "doc_rarity_score",
    "per_user_trend",
    "grouping_sets_report",
    "unpivot_melt",
    "event_transitions",
    "winsorized_stats",
]


def consume(df) -> None:
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def main() -> None:
    names = sys.argv[1:] or TAIL_SAMPLE
    registry = load_all()
    spark = get_spark(app_name="mm-r12-overhead")
    # session-wide warm: codegen cache, parquet footers, JIT
    for n in names:
        consume(registry[n].fn(spark, SF))
    out = {}
    for n in names:
        spec = registry[n]
        rec = {k: [] for k in ("build_ms", "opt_ms", "phys_ms", "exec_ms", "wall_ms")}
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.fn(spark, SF)
            t1 = time.perf_counter()
            qe = df._jdf.queryExecution()
            qe.optimizedPlan()
            t2 = time.perf_counter()
            qe.executedPlan()
            t3 = time.perf_counter()
            # fresh plan for execution so the sink's own analysis is
            # charged to exec like the bench does
            t4 = time.perf_counter()
            consume(spec.fn(spark, SF))
            t5 = time.perf_counter()
            rec["build_ms"].append((t1 - t0) * 1000)
            rec["opt_ms"].append((t2 - t1) * 1000)
            rec["phys_ms"].append((t3 - t2) * 1000)
            rec["exec_ms"].append((t5 - t4) * 1000)
            rec["wall_ms"].append((t5 - t4) * 1000 + (t3 - t0) * 1000)
        out[n] = {k: round(statistics.median(v), 1) for k, v in rec.items()}
        print(json.dumps({"query": n, **out[n]}))
    tot = {k: round(sum(v[k] for v in out.values()), 1) for k in next(iter(out.values()))}
    print(json.dumps({"TOTALS": tot, "n": len(out)}))
    with open("/tmp/r12_overhead.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
