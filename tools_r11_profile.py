#!/usr/bin/env python
"""Round-11 optimization profiler: per-query stage-level breakdown.

For every bench-flagged query (or the names passed on argv), runs the
plan warm through the bench hash-sink on a UI-enabled session and
diffs Spark's REST stage metrics around the timed pass, recording each
NEW completed stage's executorRunTime / input / shuffle bytes plus the
query wall time. Output: one JSON line per query to stdout and a
combined /tmp/r11_profile.json for analysis — this is the guide §1
"where does the time actually go" evidence the round's optimizations
start from.

Usage:
    python tools_r11_profile.py                  # all bench queries
    python tools_r11_profile.py edit_distance_topk [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import MapType  # noqa: E402

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402


def consume(df) -> None:
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def _stages(base: str, app_id: str) -> dict[int, dict]:
    out = {}
    for st in _rest(base, f"/api/v1/applications/{app_id}/stages?status=COMPLETE"):
        key = (st["stageId"], st.get("attemptId", 0))
        out[key] = st
    return out


def _stages_stable(base: str, app_id: str) -> dict:
    prev = _stages(base, app_id)
    for _ in range(40):
        time.sleep(0.4)
        cur = _stages(base, app_id)
        if set(cur) == set(prev):
            return cur
        prev = cur
    return prev


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sys.argv[1:] or sorted(n for n, s in registry.items() if s.bench)

    spark = get_spark(
        app_name="mm-r11-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4091"},
    )
    app_id = spark.sparkContext.applicationId
    base = "http://localhost:4091"

    results = {}
    for qname in names:
        spec = registry[qname]
        spark.sparkContext.setJobDescription(f"warm:{qname}")
        consume(spec.fn(spark, sf_dir))  # warm pass
        before = _stages_stable(base, app_id)
        spark.sparkContext.setJobDescription(f"timed:{qname}")
        t0 = time.perf_counter()
        consume(spec.fn(spark, sf_dir))
        wall = round(time.perf_counter() - t0, 4)
        after = _stages_stable(base, app_id)
        new = [after[k] for k in after if k not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        stages = [
            {
                "stageId": s["stageId"],
                "name": s.get("name", "")[:90],
                "runTimeMs": s.get("executorRunTime", 0),
                "cpuTimeMs": round(s.get("executorCpuTime", 0) / 1e6),
                "tasks": s.get("numCompleteTasks", 0),
                "input": s.get("inputBytes", 0),
                "shW": s.get("shuffleWriteBytes", 0),
                "shR": s.get("shuffleReadBytes", 0),
                "shRFetchWaitMs": s.get("shuffleFetchWaitTime", 0),
                "outRows": s.get("outputRecords", 0) or s.get("numOutputRows", 0),
            }
            for s in new
        ]
        results[qname] = {"wall": wall, "stages": stages}
        top = stages[0] if stages else {}
        print(
            json.dumps(
                {
                    "query": qname,
                    "wall": wall,
                    "n_stages": len(stages),
                    "total_runtime_ms": sum(s["runTimeMs"] for s in stages),
                    "top_stage": {
                        k: top.get(k) for k in ("name", "runTimeMs", "tasks", "shW")
                    },
                }
            ),
            flush=True,
        )

    with open("/tmp/r11_profile.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/r11_profile.json")
    spark.stop()


if __name__ == "__main__":
    main()
