#!/usr/bin/env python
"""Generate an sf1-shaped dataset under .scale_data/sf1 (gitignored).

The driver ships sf0.001/0.01/0.1 only; the 100 TB claims need at
least one decade of empirical scaling. This produces a deterministic
10x dataset entirely Spark-side (no RNG, no testdata writes):

- TPC-H tables: 10 key-offset copies of sf0.1. Offsetting every key
  (orderkey/custkey/suppkey/partkey) by copy*max keeps per-key group
  sizes and join fan-outs IDENTICAL to sf0.1 — growth in any
  linear-design query must then be ~10x, so a superlinear ratio is an
  engine problem, not a data artifact. nation/region stay fixed dims.
- documents: 50k synthesized word-salad docs matching the fixture's
  vocabulary shape (hash-selected words, 20 sources, en/zh/de mix),
  with a 5% slice drawn from 250 shared templates so dedup queries
  see a bounded duplicate population (matching the fixture's design,
  not 10 exact copies of every doc — naive replication would square
  LSH bucket sizes and fake a quadratic blow-up).
- embeddings: 20k x 64-dim hash-derived float vectors, 10 labels.

Run: python tools_gen_scale.py   (~1 min)
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from martian_moments_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data", "sf1")
COPIES = 10

KEY_COLS = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "customer": ("c_custkey",),
}

VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch agg filter stream big merge join window key query table part "
    "customer data vector the a"
).split()


def _doc_text(seed):
    """Deterministic word-salad text from an integer seed column —
    identical construction to the sf1 corpus, so skew variants differ
    ONLY in how seeds collide."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (F.pmod(F.xxhash64(seed.cast("string")), F.lit(90)) + 10).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (
                F.pmod(F.xxhash64(seed.cast("string"), i.cast("string")), F.lit(len(VOCAB)))
                + 1
            ).cast("int"),
        ),
    )
    return F.concat_ws(" ", words)


def gen_skew() -> None:
    """Adversarial duplicate-skew corpus: 50k docs, 5% byte-identical
    copies of ONE hot template (VERDICT r04 #7's worst case — a single
    LSH bucket holding 2500 docs). Written to .scale_data/sf1skew;
    tools_scale_smoke.py --skew measures the dedup-first composition
    against it (SKEW_SCALE.md)."""
    spark = get_spark(app_name="mm-gen-scale-skew")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data", "sf1skew")
    os.makedirs(out, exist_ok=True)
    n_docs = 50_000
    hot = n_docs // 20
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # hot slice: every seed identical -> identical text; tail: unique
    seed = F.when(F.col("doc_id") < hot, F.lit(7)).otherwise(F.col("doc_id") + 1000)
    docs = base.select(
        "doc_id",
        _doc_text(seed).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("sf1skew documents:", spark.read.parquet(f"{out}/documents.parquet").count())
    spark.stop()


def gen_sf10() -> None:
    """Second decade for the documents-family queries: 500k docs with
    the SAME text law as sf1 — the 5% template slice keeps 10 copies
    per template by scaling the template COUNT 250 -> 2500, so
    per-template group sizes, LSH bucket sizes, and anchor-gram
    collision fan-outs stay IDENTICAL to sf1 and growth in any
    linear-design query must be ~10x again (the same methodology as
    the TPC-H key-offset replication). Only documents are
    synthesized; the other tables are symlinked from sf1 so the
    DuckDB oracle's view registration still works.
    Run: python tools_gen_scale.py --sf10   (~1 min, ~0.3 GB)"""
    spark = get_spark(app_name="mm-gen-scale-sf10")
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale_data", "sf10"
    )
    os.makedirs(out, exist_ok=True)
    n_docs, n_templates = 500_000, 2_500
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_tpl = F.col("doc_id") < (n_docs // 20)
    # non-template seeds start at 1e6 so they can never collide with
    # the 0..2499 template seed range
    seed = F.when(is_tpl, F.pmod(F.col("doc_id"), F.lit(n_templates))).otherwise(
        F.col("doc_id") + 1_000_000
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("zh"), F.lit("de")),
        (
            F.pmod(F.xxhash64(F.col("doc_id").cast("string"), F.lit("lang")), F.lit(5))
            + 1
        ).cast("int"),
    )
    docs = base.select(
        "doc_id",
        _doc_text(seed).alias("text"),
        lang.alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string")
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("sf10 documents:", spark.read.parquet(f"{out}/documents.parquet").count())
    sf1 = os.path.join(os.path.dirname(out), "sf1")
    for t in sorted(os.listdir(sf1)):
        dst = os.path.join(out, t)
        if t.startswith("documents") or os.path.lexists(dst):
            continue
        os.symlink(os.path.join("..", "sf1", t), dst)
    spark.stop()


def gen_sf100() -> None:
    """Third decade for the documents-family queries: 5M docs under
    the SAME text law as sf1/sf10 — template COUNT scales 2,500 ->
    25,000 so the 5% template slice keeps exactly 10 copies per
    template and every per-template group size / collision fan-out
    stays IDENTICAL across all three decades. Three stacked decades
    (sf0.1 -> sf1 -> sf10 -> sf100, 5k -> 5M docs) is the strongest
    superlinearity detector this container can hold: a hidden
    O(n^1.3) term that hides inside one decade's noise compounds to
    ~4x across three. Only documents are synthesized; other tables
    symlink to sf1 for oracle view registration.
    Run: python tools_gen_scale.py --sf100   (~2 min, ~1.5 GB)"""
    spark = get_spark(app_name="mm-gen-scale-sf100")
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale_data", "sf100"
    )
    os.makedirs(out, exist_ok=True)
    n_docs, n_templates = 5_000_000, 25_000
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_tpl = F.col("doc_id") < (n_docs // 20)
    # non-template seeds start at 1e7 so they can never collide with
    # the 0..24999 template seed range
    seed = F.when(is_tpl, F.pmod(F.col("doc_id"), F.lit(n_templates))).otherwise(
        F.col("doc_id") + 10_000_000
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("zh"), F.lit("de")),
        (
            F.pmod(F.xxhash64(F.col("doc_id").cast("string"), F.lit("lang")), F.lit(5))
            + 1
        ).cast("int"),
    )
    docs = base.select(
        "doc_id",
        _doc_text(seed).alias("text"),
        lang.alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string")
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(64).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("sf100 documents:", spark.read.parquet(f"{out}/documents.parquet").count())
    sf1 = os.path.join(os.path.dirname(out), "sf1")
    for t in sorted(os.listdir(sf1)):
        dst = os.path.join(out, t)
        if t.startswith("documents") or os.path.lexists(dst):
            continue
        os.symlink(os.path.join("..", "sf1", t), dst)
    spark.stop()


def gen_sf10cust() -> None:
    """Edit-distance decade 2 input (VERDICT r10 Next-round #4): a
    1.5M-row customer table = 10 key-offset copies of sf1's 150k with
    REPLICA-DISTINCT name prefixes. The tag discipline is what keeps
    the decade honest: sf1's replication left names byte-identical
    across copies (10 copies per name per nation), so replicating
    again unchanged would put 100 identical copies in each block and
    grow the ed<=2 pair mass ~100x per decade BY DATA CONSTRUCTION —
    the same artifact the span family's vocabulary saturation causes.
    Prefixing copies 1..9 with three-character tags that pairwise
    differ in every position ("AAA-".."III-") pins every cross-replica
    name pair at edit distance >= 3 > 2, so the true pair set is
    exactly 10 disjoint shifted copies of sf1's: pair mass grows
    exactly 10x, per-block structure is preserved, and replica 0
    (untagged, ids < 150k) IS sf1's pair set — the affordable parity
    anchor, since the quadratic all-pairs DuckDB oracle is
    cost-walled at 1.5M rows. Run: python tools_gen_scale.py
    --sf10cust (~1 min)."""
    spark = get_spark(app_name="mm-gen-scale-sf10cust")
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale_data", "sf10cust"
    )
    os.makedirs(out, exist_ok=True)
    sf1 = os.path.join(os.path.dirname(out), "sf1")
    c = spark.read.parquet(f"{sf1}/customer.parquet")
    off = c.agg(F.max("c_custkey")).collect()[0][0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
    tags = F.array(
        F.lit(""), *[F.lit(chr(ord("A") + i) * 3 + "-") for i in range(1, COPIES)]
    )
    out_df = (
        c.crossJoin(copies)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("__copy") * F.lit(off))
        .withColumn(
            "c_name",
            F.concat(F.element_at(tags, (F.col("__copy") + 1).cast("int")), F.col("c_name")),
        )
        .drop("__copy")
    )
    out_df.repartition(32).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    print("sf10cust customer:", spark.read.parquet(f"{out}/customer.parquet").count())
    for t in sorted(os.listdir(sf1)):
        dst = os.path.join(out, t)
        if t.startswith("customer") or os.path.lexists(dst):
            continue
        os.symlink(os.path.join("..", "sf1", t), dst)
    spark.stop()


def main() -> None:
    spark = get_spark(app_name="mm-gen-scale")
    os.makedirs(OUT, exist_ok=True)

    for t in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )

    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        offs = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
        out = df.crossJoin(copies)
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("__copy") * F.lit(offs[k]))
        out.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )

    # documents: 50k docs, hash-driven word selection; doc 0..2499 of
    # the template slice share text via template_id = doc_id % 250
    n_docs = 50_000
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_tpl = F.col("doc_id") < (n_docs // 20)
    seed = F.when(is_tpl, F.pmod(F.col("doc_id"), F.lit(250))).otherwise(F.col("doc_id") + 1000)
    text = _doc_text(seed)
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("zh"), F.lit("de")),
        (F.pmod(F.xxhash64(F.col("doc_id").cast("string"), F.lit("lang")), F.lit(5)) + 1).cast("int"),
    )
    docs = base.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # embeddings: 20k x 64 floats in [-1, 1)
    n_vec, dim = 20_000, 64
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id").cast("string"), j.cast("string")), F.lit(2000))
                .cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64((F.col("id") + 7).cast("string")), F.lit(10)).cast("int").alias("label"),
    )
    emb.repartition(8).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    # events: 10 copies with user/event id offsets (streaming-family
    # queries aren't in the named smoke, but keep the dir complete)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    id_cols = [c for c in ev.columns if c.endswith("_id")]
    offs = {k: ev.agg(F.max(k)).collect()[0][0] + 1 for k in id_cols}
    copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
    out = ev.crossJoin(copies)
    for k in id_cols:
        out = out.withColumn(k, F.col(k) + F.col("__copy") * F.lit(offs[k]))
    out.drop("__copy").repartition(32).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    for t in sorted(os.listdir(OUT)):
        n = spark.read.parquet(f"{OUT}/{t}").count()
        print(t, n)
    spark.stop()




def _emb_df(spark, n_vec: int, dim: int = 64):
    """The fixture's embedding law at any size: 64 hash-derived floats
    in [-1, 1) per vector, 10 labels — same expression as main()'s
    20k set, so sf10emb/sf100emb vectors 0..19999 are IDENTICAL to
    sf1's (a superset, the key-offset-replication analogue: the law,
    not the data, is what scales)."""
    return spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id").cast("string"), j.cast("string")), F.lit(2000))
                .cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64((F.col("id") + 7).cast("string")), F.lit(10)).cast("int").alias("label"),
    )


def gen_embdecade() -> None:
    """Embedding decade pair for the quantizer-family scale evidence
    (VERDICT r08 Next-round #4): .scale_data/sf10emb (500k x 64) and
    .scale_data/sf100emb (5M x 64) under the same hash law as sf1's
    20k set. Separate dirs (not a swap of sf10/sf100's embeddings
    symlink) so the recorded documents-family decade evidence keeps
    its exact inputs. Other tables symlink to sf1 for oracle view
    registration. Run: python tools_gen_scale.py --embdecade
    (~3 min, ~1.6 GB)."""
    spark = get_spark(app_name="mm-gen-scale-emb")
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data")
    for name, n_vec, parts in (("sf10emb", 500_000, 16), ("sf100emb", 5_000_000, 64)):
        out = os.path.join(base, name)
        os.makedirs(out, exist_ok=True)
        _emb_df(spark, n_vec).repartition(parts).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )
        print(name, "embeddings:", spark.read.parquet(f"{out}/embeddings.parquet").count())
        sf1 = os.path.join(base, "sf1")
        for t in sorted(os.listdir(sf1)):
            dst = os.path.join(out, t)
            if t.startswith("embeddings") or os.path.lexists(dst):
                continue
            os.symlink(os.path.join("..", "sf1", t), dst)
    spark.stop()

if __name__ == "__main__":
    if "--skew" in sys.argv:
        gen_skew()
    elif "--embdecade" in sys.argv:
        gen_embdecade()
    elif "--sf100" in sys.argv:
        gen_sf100()
    elif "--sf10cust" in sys.argv:
        gen_sf10cust()
    elif "--sf10" in sys.argv:
        gen_sf10()
    else:
        main()
