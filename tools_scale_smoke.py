#!/usr/bin/env python
"""Scale smoke: the engine's core shuffle shapes at ~10M synthetic rows
(two orders of magnitude past sf0.1's fact) on local[32].

The oracle-parity suite proves CORRECTNESS at small SF; this tool is
the EFFICIENCY evidence at the largest size this container handles
comfortably: generated in-memory via ``spark.range`` (no testdata
writes), exercising exactly the plan families the 100 TB design
document claims scale — high-cardinality hash agg with map-side
combine, partitioned window, fact-fact sort-merge join, fingerprint
dedup, salted hot-key agg vs its unsalted form.

Run: python tools_scale_smoke.py            (~1-2 min)
Prints one JSON line: {"rows": N, "shapes": {name: sec, ...}}
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from martian_moments_spark.operators.skew import salted_agg  # noqa: E402
from martian_moments_spark.session import get_spark  # noqa: E402

N = 10_000_000

spark = get_spark(app_name="mm-scale-smoke")

fact = (
    spark.range(0, N)
    .select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k_high"),  # ~1M keys
        F.pmod(F.xxhash64("id"), F.lit(1_000)).alias("k_mid"),
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(1_000)))
        .alias("k_hot"),  # 90% of rows on one key
        (F.col("id") % 97).cast("double").alias("v"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    .localCheckpoint(eager=True)
)
dim = (
    spark.range(0, 1_000)
    .select(F.col("id").alias("k_mid"), (F.col("id") * 3).alias("w"))
    .localCheckpoint(eager=True)
)


def timed(name, fn, out):
    t0 = time.perf_counter()
    fn()
    out[name] = round(time.perf_counter() - t0, 2)


shapes: dict[str, float] = {}

# high-cardinality hash aggregate: the shuffle carries one partial per
# (key, task) thanks to map-side combine
timed(
    "hash_agg_1m_keys",
    lambda: fact.groupBy("k_high").agg(F.sum("v"), F.count(F.lit(1))).agg(
        F.count(F.lit(1))
    ).collect(),
    shapes,
)

# partitioned window (running sum per mid-cardinality key)
from pyspark.sql.window import Window as W  # noqa: E402

w = W.partitionBy("k_mid").orderBy("id").rowsBetween(W.unboundedPreceding, 0)
timed(
    "window_partitioned",
    lambda: fact.withColumn("rs", F.sum("v").over(w))
    .agg(F.sum("rs"))
    .collect(),
    shapes,
)

# fact-fact sort-merge join on the mid key (1k rows per key each side
# would explode; join on id-derived disjoint halves instead)
a = fact.filter(F.col("id") % 2 == 0).select(F.col("id").alias("j"), "v")
b = fact.filter(F.col("id") % 2 == 1).select((F.col("id") - 1).alias("j"), "v")
timed(
    "fact_fact_join",
    lambda: a.join(b, "j").agg(F.count(F.lit(1))).collect(),
    shapes,
)

# fingerprint dedup (the exact-dedup shuffle at 10M rows)
timed(
    "fingerprint_dedup",
    lambda: fact.groupBy("fp").agg(F.min("id")).agg(F.count(F.lit(1))).collect(),
    shapes,
)

# hot-key aggregate: unsalted vs salted two-phase (both exact)
timed(
    "hot_agg_unsalted",
    lambda: fact.groupBy("k_hot").agg(F.sum("v").alias("s")).agg(F.sum("s")).collect(),
    shapes,
)
timed(
    "hot_agg_salted",
    lambda: salted_agg(
        fact, ["k_hot"], {"s": (F.sum("v"), "sum")}, salt_source="id"
    )
    .agg(F.sum("s"))
    .collect(),
    shapes,
)

# broadcast dim join across the full fact
timed(
    "broadcast_dim_join",
    lambda: fact.join(F.broadcast(dim), "k_mid")
    .agg(F.sum(F.col("v") * F.col("w")))
    .collect(),
    shapes,
)

# count-min sketch build over the 10M-row fingerprint column: 4 hash
# rows explode to 40M intermediate rows, but map-side combine means at
# most D*W = 4096 cells leave each task
from martian_moments_spark.functions.sketches import cms_build  # noqa: E402

timed(
    "cms_build_10m_keys",
    lambda: cms_build(fact.select("fp"), "fp")
    .agg(F.sum("total"), F.count(F.lit(1)))
    .collect(),
    shapes,
)

# PQ ADC scan: 2M encoded vectors x 16 subspaces joined against a
# broadcast 5-query LUT, summed per (query, vector) — the compressed
# ANN search shape (llmops/pq.py) at cluster-ish scale
n_vec, n_sub, n_codes, n_q = 2_000_000, 16, 64, 5
codes = (
    spark.range(0, n_vec * n_sub)
    .select(
        (F.col("id") / n_sub).cast("long").alias("vec_id"),
        (F.col("id") % n_sub).cast("int").alias("m"),
        F.pmod(F.xxhash64("id"), F.lit(n_codes)).cast("int").alias("code"),
    )
    .localCheckpoint(eager=True)
)
lut = (
    spark.range(0, n_q * n_sub * n_codes)
    .select(
        (F.col("id") / (n_sub * n_codes)).cast("long").alias("query_id"),
        ((F.col("id") / n_codes) % n_sub).cast("int").alias("m"),
        (F.col("id") % n_codes).cast("int").alias("code"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("pdist"),
    )
    .localCheckpoint(eager=True)
)
timed(
    "pq_adc_scan_2m_vectors",
    lambda: codes.join(F.broadcast(lut), ["m", "code"])
    .groupBy("query_id", "vec_id")
    .agg(F.sum("pdist").alias("adc"))
    .agg(F.count(F.lit(1)), F.sum("adc"))
    .collect(),
    shapes,
)

print(json.dumps({"rows": N, "shapes": shapes, "total": round(sum(shapes.values()), 2)}))
spark.stop()
