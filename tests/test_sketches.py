"""Count-min sketch laws: mergeability (the streaming/incremental
property), the never-underestimate guarantee, and partition
invariance. Oracle parity proves the registered query; these pin the
algebra the query can't show."""

from __future__ import annotations

import pyspark.sql.functions as F

from martian_moments_spark.catalog import load
from martian_moments_spark.functions.sketches import (
    CMS_SEEDS,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_merge,
)
from martian_moments_spark.llmops.textops import tokens

SF_DIR = "/root/testdata/sf0.001"


def _tok_counts(spark, which=None):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    if which == "even":
        docs = docs.filter(F.col("doc_id") % 2 == 0)
    elif which == "odd":
        docs = docs.filter(F.col("doc_id") % 2 == 1)
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _cells(df):
    return {(r["row"], r["bucket"]): r["total"] for r in df.collect()}


def test_cms_merge_equals_sketch_of_union(spark):
    """Cell-wise sum of two half-corpus sketches == the sketch of the
    whole corpus — the algebraic property that lets per-batch/stream
    sketches combine without reprocessing."""
    whole = cms_build(_tok_counts(spark), "tok", weight_col="n")
    even = cms_build(_tok_counts(spark, "even"), "tok", weight_col="n")
    odd = cms_build(_tok_counts(spark, "odd"), "tok", weight_col="n")
    merged = cms_merge(even, odd)
    assert _cells(whole) == _cells(merged)


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    cnt = _tok_counts(spark)
    sketch = cms_build(cnt, "tok", weight_col="n")
    est = cms_estimate(sketch, cnt.select("tok"), "tok")
    rows = cnt.join(est, "tok").collect()
    assert rows
    assert all(r["cms_estimate"] >= r["n"] for r in rows), "CMS underestimated"
    # the classic error bound: overcount <= e/W * total mass (w.h.p.);
    # assert the much looser deterministic sanity that SOME keys are
    # exact and the mean overcount is small next to the corpus
    total = sum(r["n"] for r in rows)
    overs = [r["cms_estimate"] - r["n"] for r in rows]
    assert min(overs) == 0
    assert sum(overs) / len(overs) < total / CMS_WIDTH * len(CMS_SEEDS)


def test_cms_partition_invariant(spark):
    cnt = _tok_counts(spark)
    a = cms_build(cnt, "tok", weight_col="n")
    b = cms_build(cnt.repartition(13), "tok", weight_col="n")
    assert _cells(a) == _cells(b)


def test_streaming_cms_sink_matches_batch_sketch(spark, tmp_path):
    """Stream the documents' tokens through the CMS sink in file-batch
    order; the persisted grid must equal the one-shot batch sketch —
    batch boundaries invisible, per the merge law."""
    from martian_moments_spark.streaming.sinks import cms_sketch_sink

    src = str(tmp_path / "src")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # two input files -> availableNow processes them as (>=1) batches
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src + "/batch=a"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        src + "/batch=b"
    )
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/batch=*")
        .select(F.explode(tokens("text")).alias("tok"))
    )
    q = cms_sketch_sink(
        stream,
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
        key_col="tok",
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["bucket"]): r["total"]
        for r in spark.read.parquet(str(tmp_path / "sketch")).collect()
    }
    want = _cells(cms_build(_tok_counts(spark), "tok", weight_col="n"))
    assert got == want
