#!/usr/bin/env python
"""Same-session A/B for the r11 spread/repartition optimizations.

Cross-session bench comparisons on this host are unreliable (measured:
an idle-machine bench run 1.5-2x slower than one 30 min later — host
CPU steal comes in windows). This harness removes that axis: for each
named query it builds variant A (spread_fanout / repartition_for_key
monkeypatched to identity == the pre-patch plan) and variant B (the
real operators), warms both, then times them INTERLEAVED (A,B,A,B,...)
in one session so any drift hits both arms equally. Medians and
per-run arrays go to stdout and /tmp/r11_ab_<query>.json.

Usage:
    python tools_r11_ab.py lm_perplexity_filter bm25_probe_ranking ...
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

# modules whose imported spread symbols the identity arm must null out
_PATCH_SITES = (
    "martian_moments_spark.llmops.lm",
    "martian_moments_spark.llmops.dedup",
    "martian_moments_spark.plans.queries_llm",
    "martian_moments_spark.plans.queries_analytics",
    "martian_moments_spark.plans.queries_incremental",
    "martian_moments_spark.plans.queries_nested",
    "martian_moments_spark.plans.queries_operators",
    "martian_moments_spark.plans.queries_relational",
    "martian_moments_spark.plans.queries_streaming",
    "martian_moments_spark.plans.queries_tpch",
    "martian_moments_spark.operators.parallelize",
)


def consume(df: DataFrame) -> None:
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def _set_identity(on: bool) -> None:
    import importlib

    def ident_spread(df, key_col):
        return df

    def ident_repart(df, *cols):
        return df

    def ident_spread_scan(df, memo_key, key_col, *more):
        return df

    from martian_moments_spark.operators import parallelize

    real_spread = parallelize.__dict__.get("_real_spread_fanout")
    real_repart = parallelize.__dict__.get("_real_repartition_for_key")
    real_spread_scan = parallelize.__dict__.get("_real_spread_scan")
    if real_spread is None:
        parallelize._real_spread_fanout = parallelize.spread_fanout
        parallelize._real_repartition_for_key = getattr(
            parallelize, "repartition_for_key", ident_repart
        )
        parallelize._real_spread_scan = getattr(
            parallelize, "spread_scan", ident_spread_scan
        )
        real_spread = parallelize._real_spread_fanout
        real_repart = parallelize._real_repartition_for_key
        real_spread_scan = parallelize._real_spread_scan
    for name in _PATCH_SITES:
        mod = importlib.import_module(name)
        if hasattr(mod, "spread_fanout"):
            mod.spread_fanout = ident_spread if on else real_spread
        if hasattr(mod, "repartition_for_key"):
            mod.repartition_for_key = ident_repart if on else real_repart
        if hasattr(mod, "spread_scan"):
            mod.spread_scan = ident_spread_scan if on else real_spread_scan


def main() -> None:
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark(app_name="mm-r11-ab")
    out = {}
    for n in names:
        spec = registry[n]
        # warm both arms (codegen + parquet footers + JIT)
        for on in (True, False, True, False):
            _set_identity(on)
            consume(spec.fn(spark, SF))
        runs = {"A_identity": [], "B_spread": []}
        arm_order = (("A_identity", True), ("B_spread", False))
        if os.environ.get("AB_ORDER") == "BA":
            arm_order = arm_order[::-1]
        for _ in range(PASSES):
            for key, on in arm_order:
                _set_identity(on)
                t0 = time.perf_counter()
                consume(spec.fn(spark, SF))
                runs[key].append(round(time.perf_counter() - t0, 4))
        med = {k: round(statistics.median(v), 4) for k, v in runs.items()}
        res = {"query": n, "sf_dir": SF, "median": med, "runs": runs,
               "speedup": round(med["A_identity"] / med["B_spread"], 3)}
        out[n] = res
        print(json.dumps(res))
        with open(f"/tmp/r11_ab_{n}.json", "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
