#!/usr/bin/env python
"""Same-session interleaved A/B for the r12 rewrites (the r11
discipline: both arms built in ONE session, warmed, then timed
interleaved A,B,A,B,... so host drift hits both arms equally).

Arms are session-conf toggles — the same plan builders run in both:

    sig      edit-distance deletion-signature backend
             (martian.dedup.deletionSigKernel jvm vs arrow)
    cc       connected-components round fusion
             (martian.dedup.ccTwoHop false vs true)
    wm       weighted_median_per_group: registered two-phase vs the
             inlined single-window reference (no conf; ref is local)

Usage:
    python tools_r12_ab.py sig edit_distance_pairs edit_distance_topk
    python tools_r12_ab.py cc dedup_connected_components ...
    python tools_r12_ab.py wm
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

CONF_ARMS = {
    "sig": ("martian.dedup.deletionSigKernel", "jvm", "arrow"),
    "cc": ("martian.dedup.ccTwoHop", "false", "true"),
}


def consume(df: DataFrame) -> None:
    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.xxhash64(*cols).alias("__h")).agg(F.bit_xor("__h")).collect()


def _wm_reference(spark, sf_dir):
    """Pre-r12 single-window weighted median, inlined byte-for-byte."""
    from pyspark.sql.window import Window as W

    from martian_moments_spark.catalog import load

    u = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pu"),
        F.round("l_quantity").cast("long").alias("w"),
    )
    byval = u.groupBy("l_returnflag", "pu").agg(F.sum("w").cast("long").alias("w"))
    w_cum = W.partitionBy("l_returnflag").orderBy("pu")
    w_tot = W.partitionBy("l_returnflag")
    cum = byval.select(
        "l_returnflag",
        "pu",
        F.sum("w").over(w_cum).cast("long").alias("cw"),
        F.sum("w").over(w_tot).cast("long").alias("tot"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min("tot").alias("total_weight"),
        (
            F.min(F.when(2 * F.col("cw") >= F.col("tot"), F.col("pu"))).cast("double")
            / F.lit(100.0)
        ).alias("weighted_median_price"),
    )


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:] or (["weighted_median_per_group"] if mode == "wm" else [])
    registry = load_all()
    spark = get_spark(app_name=f"mm-r12-ab-{mode}")
    out = {}
    for n in names:
        spec = registry[n]
        if mode == "wm":
            build = {"A_old": lambda: _wm_reference(spark, SF),
                     "B_new": lambda: spec.fn(spark, SF)}
        else:
            conf_key, a_val, b_val = CONF_ARMS[mode]

            def _mk(val):
                def b():
                    spark.conf.set(conf_key, val)
                    return spec.fn(spark, SF)
                return b

            build = {"A_old": _mk(a_val), "B_new": _mk(b_val)}
        # warm both arms twice (codegen + JIT + parquet footers)
        for _ in range(2):
            for fn in build.values():
                consume(fn())
        runs = {k: [] for k in build}
        order = list(build.items())
        if os.environ.get("AB_ORDER") == "BA":
            order = order[::-1]
        for _ in range(PASSES):
            for key, fn in order:
                t0 = time.perf_counter()
                consume(fn())
                runs[key].append(round(time.perf_counter() - t0, 4))
        med = {k: round(statistics.median(v), 4) for k, v in runs.items()}
        res = {"query": n, "mode": mode, "sf_dir": SF, "median": med, "runs": runs,
               "speedup": round(med["A_old"] / med["B_new"], 3)}
        out[n] = res
        print(json.dumps(res))
        with open(f"/tmp/r12_ab_{mode}_{n}.json", "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
