#!/usr/bin/env python
"""Same-session interleaved A/B for conf-gated scale-adaptive spreads.

A arm = query built with martian.textops.anchorSpread=never (the
pre-change plan: scan_is_narrow returns False so no spread fires),
B arm = built with the default auto probe. Both plans are built once,
warmed, then timed interleaved (A,B,A,B,...) so host drift hits both
arms equally. AB_ORDER=BA reverses arm order.

Usage: python tools_r11_ab3.py dedup_connected_components [more...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.types import MapType  # noqa: E402

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "5"))


def consume(df: DataFrame) -> None:
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def main() -> None:
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark(app_name="mm-r11-ab3")
    for n in names:
        fn = registry[n].fn

        def build(mode: str) -> DataFrame:
            spark.conf.set("martian.textops.anchorSpread", mode)
            try:
                return fn(spark, SF)
            finally:
                spark.conf.unset("martian.textops.anchorSpread")

        # NOTE: iterative queries (connected components) run driver
        # loops at build time, so each timed pass re-BUILDS the plan —
        # that is what the bench measures too.
        arms = {"A_old": lambda: build("never"), "B_new": lambda: build("auto")}
        for _ in range(2):
            for b in arms.values():
                consume(b())
        runs = {"A_old": [], "B_new": []}
        order = ["A_old", "B_new"]
        if os.environ.get("AB_ORDER") == "BA":
            order = order[::-1]
        for _ in range(PASSES):
            for key in order:
                t0 = time.perf_counter()
                consume(arms[key]())
                runs[key].append(round(time.perf_counter() - t0, 4))
        med = {k: round(statistics.median(v), 4) for k, v in runs.items()}
        res = {
            "query": n,
            "sf_dir": SF,
            "median": med,
            "runs": runs,
            "speedup": round(med["A_old"] / med["B_new"], 3),
        }
        print(json.dumps(res))
        with open(f"/tmp/r11_ab3_{n}.json", "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
