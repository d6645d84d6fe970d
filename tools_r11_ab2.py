#!/usr/bin/env python
"""Same-session interleaved A/B for r11 STRUCTURAL rewrites.

tools_r11_ab.py toggles the spread operators via monkeypatch; this
harness covers rewrites where the old form is a different plan shape
entirely. For each target it holds TWO plan builders — A = the
pre-rewrite form (inlined below, byte-for-byte the old query body),
B = the registered (rewritten) form — warms both, then times them
INTERLEAVED (A,B,A,B,...) in one session so host drift hits both arms
equally. Set AB_ORDER=BA to reverse arm order (order-effect control).
Results: stdout JSON + /tmp/r11_ab2_<name>.json.

Usage:
    python tools_r11_ab2.py repeated_char_spans tpch_q18_large_volume_customers
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

from martian_moments_spark.catalog import load  # noqa: E402
from martian_moments_spark.llmops.dedup import merge_hit_islands  # noqa: E402
from martian_moments_spark.llmops.textops import (  # noqa: E402
    CHAR_ANCHOR_K,
    CHAR_ANCHOR_SEL,
    char_anchor_grams,
    scan_is_narrow,
)
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


# ---------------------------------------------------------------- old forms


def _old_char_span_islands(docs, k=None, sel=None, spread=None):
    """Pre-r11 form: groupBy(g) dup set + join back (anch consumed
    twice -> Generate re-derived per consumer + dup-gram broadcast)."""
    K = CHAR_ANCHOR_K if k is None else k
    SEL = CHAR_ANCHOR_SEL if sel is None else sel
    anch = char_anchor_grams(docs, k=K, sel=SEL, spread=spread)
    dup = (
        anch.groupBy("g")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("g")
    )
    hits = anch.join(dup, "g").select("doc_id", "i")
    return merge_hit_islands(hits, K)


def old_repeated_char_spans(spark, sf_dir):
    from martian_moments_spark.llmops.dedup import char_span_stats as _css
    import martian_moments_spark.llmops.dedup as _d

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sp = scan_is_narrow(docs, memo_key=sf_dir + ":documents")
    real = _d.char_span_islands
    _d.char_span_islands = _old_char_span_islands
    try:
        out = _css(docs, tau=0.3, spread=sp)
    finally:
        _d.char_span_islands = real
    return out


def old_tpch_q18(spark, sf_dir):
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity")).cast("long").alias("qty")
    )
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    kept = lineitem.join(
        big_orders.withColumnRenamed("l_orderkey", "bo_orderkey"),
        F.col("l_orderkey") == F.col("bo_orderkey"),
        "left_semi",
    )
    return (
        kept.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("qty").cast("long").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def old_corpus_curation(spark, sf_dir):
    """Pre-r11 form: two-step unpack of quality_metrics_packed; the
    gate filter is pushed below the projection and re-inlines the
    packed expression (scored ~2x per row)."""
    from martian_moments_spark.llmops.textops import quality_metrics_packed

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    scored = docs.select(
        "doc_id", "lang", "source", "text",
        quality_metrics_packed("text").alias("__q"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.col("__q.n_tokens").alias("n_tokens"),
        F.col("__q.distinct_ratio").alias("distinct_ratio"),
    )
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("distinct_ratio") >= 0.3))
    deduped = (
        kept.groupBy(F.md5("text").alias("__fp"))
        .agg(F.min(F.struct("doc_id", "lang", "source", "n_tokens")).alias("__r"))
        .select("__r.*")
    )
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_tokens"
        ),
    )


def old_curation_to_training_mix(spark, sf_dir):
    """Pre-r11-barrier form: alias-then-unpack quality gate (pushdown
    re-inlines the packed expression into the gate filter)."""
    import martian_moments_spark.plans.queries_llm as qllm
    from martian_moments_spark.llmops.textops import (
        portable_hash31,
        quality_metrics_packed,
        word_shingles,
    )
    from martian_moments_spark.guards import assert_bounded

    raw_docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    docs = qllm.spread_fanout(raw_docs, "doc_id")
    scored = docs.select(
        "doc_id", "lang", "text", quality_metrics_packed("text").alias("__q")
    ).select(
        "doc_id", "lang", "text",
        F.col("__q.n_tokens").alias("n_tokens"),
        F.col("__q.distinct_ratio").alias("distinct_ratio"),
    )
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("distinct_ratio") >= 0.3))
    winners = kept.groupBy(F.md5("text").alias("__fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = kept.join(winners.select("doc_id"), "doc_id")

    is_bench = F.col("doc_id") % qllm.DECONTAM_BENCH_MOD == 0
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    word_shingles("text", n=qllm.DECONTAM_NGRAM), portable_hash31
                )
            )
        ).alias("sh"),
    )
    assert_bounded(
        docs.filter(is_bench).select("doc_id"),
        qllm.DECONTAM_BENCH_DOC_CAP,
        "curation_to_training_mix benchmark docs",
        once_key=sf_dir,
    )
    bench_sh = sh.filter(is_bench).select("sh").distinct()
    contaminated = (
        sh.filter(~is_bench).join(F.broadcast(bench_sh), "sh").select("doc_id").distinct()
    )
    clean = deduped.filter(~is_bench).join(contaminated, "doc_id", "left_anti")

    h = portable_hash31(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    assigned = clean.withColumn(
        "split", F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def old_lm_perplexity_filter(spark, sf_dir):
    """Pre-r11 form of bigram_lm_scores: inner bigram explode + doc-id
    spine left-joined back (4th corpus read + one extra shuffle join)."""
    import martian_moments_spark.llmops.lm as lm
    from martian_moments_spark.llmops.lm import (
        _BG_PAIRS,
        _doc_bigrams,
        BIGRAM_PPL_MAX,
        lm_gate,
    )
    from martian_moments_spark.llmops.textops import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ppl_max = BIGRAM_PPL_MAX
    toks = lm.spread_fanout(docs, "doc_id").select("doc_id", tokens("text").alias("t"))
    ref = toks.filter(lm_gate(F.col("t")))
    v = ref.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").cast("long").alias("v")
    )
    model = (
        _doc_bigrams(ref).groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    ctx = (
        model.select(F.split(F.col("bg"), " ", 2).getItem(0).alias("lw"), "cb")
        .groupBy("lw")
        .agg(F.sum("cb").cast("long").alias("cu"))
    )
    scored = (
        _doc_bigrams(toks)
        .join(model, "bg", "left")
        .join(ctx, "lw", "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.count("cb").cast("long").alias("n_hit_bigrams"),
            F.sum(F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("long").alias("score_num"),
            F.sum(F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
            .cast("long")
            .alias("score_den"),
        )
    )
    has_bg = F.col("n_bigrams").isNotNull()
    return (
        toks.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("n_hit_bigrams", F.lit(0).cast("long")).alias("n_hit_bigrams"),
            F.coalesce("score_num", F.lit(0).cast("long")).alias("score_num"),
            F.coalesce("score_den", F.lit(0).cast("long")).alias("score_den"),
            F.when(
                has_bg,
                F.col("score_den").cast("double") / F.col("score_num").cast("double"),
            ).alias("ppl_proxy"),
            F.coalesce(
                F.when(has_bg, F.col("score_den") <= F.col("score_num") * ppl_max),
                F.lit(False),
            ).alias("keep"),
        )
    )


def _old_suffix_array_ranks(shard):
    """Pre-r11 form: ascii 1-char initial rank (3 extra doubling
    rounds) — byte-for-byte the old loop."""
    from pyspark.sql.window import Window as W

    suf = shard.filter(F.length("text") > 0).select(
        "doc_id",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
    ).select(
        "doc_id",
        "i",
        "n_chars",
        F.expr("ascii(substr(text, i, 1))").cast("long").alias("rank"),
    )
    r = suf.localCheckpoint(eager=True)
    n = r.count()
    if n == 0:
        return r
    max_len = r.agg(F.max("n_chars")).first()[0] or 0
    k = 1
    while k < max_len:
        shifted = r.select(
            "doc_id", (F.col("i") - F.lit(k)).alias("i"), F.col("rank").alias("rank2")
        )
        paired = r.join(shifted, ["doc_id", "i"], "left").na.fill({"rank2": -1})
        w = W.orderBy("rank", "rank2")
        r = paired.select(
            "doc_id", "i", "n_chars", F.dense_rank().over(w).cast("long").alias("rank")
        ).localCheckpoint(eager=True)
        if r.agg(F.max("rank")).first()[0] == n:
            break
        k *= 2
    return r


def old_exact_substring_spans(spark, sf_dir):
    """Pre-r11 form: single-task LCP tail (no repartition after the
    adjacency window) + 1-char initial rank."""
    from pyspark.sql.window import Window as W

    from martian_moments_spark.catalog import table_rows
    from martian_moments_spark.llmops.dedup import SA_MIN_SHARED, sa_shard_mod
    from martian_moments_spark.llmops.textops import portable_hash31 as _h31

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = table_rows(sf_dir, "documents")
    if n is None:
        n = docs.count()
    mod = sa_shard_mod(n)
    shard = docs.filter(
        _h31(F.concat(F.lit("sa:"), F.col("doc_id").cast("string"))) % mod == 0
    )
    min_shared = SA_MIN_SHARED
    sa = _old_suffix_array_ranks(shard)
    w = W.orderBy("rank", "doc_id", "i")
    adj = (
        sa.select("doc_id", "i", "rank")
        .withColumn("pdoc", F.lag("doc_id").over(w))
        .withColumn("pi", F.lag("i").over(w))
        .filter(F.col("pdoc").isNotNull() & (F.col("pdoc") != F.col("doc_id")))
    )
    ta = shard.select(F.col("doc_id").alias("doc_id"), F.col("text").alias("ta"))
    tb = shard.select(F.col("doc_id").alias("pdoc"), F.col("text").alias("tb"))
    lcp = F.expr(
        """
        coalesce(
          array_min(filter(
            sequence(1, least(length(ta) - i + 1, length(tb) - pi + 1)),
            x -> substr(ta, i + x - 1, 1) <> substr(tb, pi + x - 1, 1))),
          least(length(ta) - i + 1, length(tb) - pi + 1) + 1) - 1
        """
    ).cast("long")
    pairs = (
        adj.join(ta, "doc_id").join(tb, "pdoc").select("doc_id", "pdoc", lcp.alias("lcp"))
    )
    both = pairs.select("doc_id", "lcp").unionByName(
        pairs.select(F.col("pdoc").alias("doc_id"), "lcp")
    )
    per = both.groupBy("doc_id").agg(F.max("lcp").alias("longest_shared_len"))
    longest = F.coalesce(F.col("longest_shared_len"), F.lit(0).cast("long"))
    return shard.join(per, "doc_id", "left").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        longest.alias("longest_shared_len"),
        (longest < min_shared).alias("keep"),
    )


def _old_classifier_scores(docs, epochs=None):
    """Pre-r11 form of llmops.classifier.classifier_scores: no
    localCheckpoint barriers (labeled + counts recomputed by the
    returned plan after the sample collect already computed them) and
    scoring re-explodes the corpus bigrams instead of reusing counts."""
    import numpy as np

    from martian_moments_spark.llmops.classifier import (
        CLS_BUCKETS,
        CLS_EPOCHS,
        CLS_SAMPLE,
        _doc_bucket_rows,
        train_perceptron,
    )
    from martian_moments_spark.llmops.lm import bigram_lm_scores, lm_gate
    from martian_moments_spark.llmops.textops import portable_hash31, tokens

    if epochs is None:
        epochs = CLS_EPOCHS
    spark = docs.sparkSession
    toks = docs.select("doc_id", tokens("text").alias("t"))
    labeled = (
        toks.select("doc_id", lm_gate(F.col("t")).alias("gate"))
        .join(bigram_lm_scores(docs).select("doc_id", "keep"), "doc_id")
        .select(
            "doc_id",
            F.when(F.col("gate") & F.col("keep"), 1)
            .when(~F.col("gate") & ~F.col("keep"), -1)
            .otherwise(0)
            .cast("int")
            .alias("seed_label"),
        )
    )
    feats = _doc_bucket_rows(toks)
    counts = feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sample_ids = (
        labeled.filter(F.col("seed_label") != 0)
        .join(counts.select("doc_id").distinct(), "doc_id")
        .withColumn(
            "__h",
            portable_hash31(F.concat(F.lit("cls:"), F.col("doc_id").cast("string"))),
        )
        .orderBy("__h", "doc_id")
        .limit(CLS_SAMPLE)
        .select("doc_id", "seed_label", "__h")
    )
    rows = (
        sample_ids.join(counts, "doc_id")
        .select("__h", "doc_id", "seed_label", "bucket", "cnt")
        .collect()
    )
    order: dict = {}
    for r in rows:
        key = (r["__h"], r["doc_id"])
        order.setdefault(key, (r["seed_label"], []))[1].append((r["bucket"], r["cnt"]))
    keys = sorted(order)
    X = np.zeros((len(keys), CLS_BUCKETS), dtype=np.int64)
    y = np.zeros(len(keys), dtype=np.int64)
    for i, key in enumerate(keys):
        lbl, pairs = order[key]
        y[i] = lbl
        for bkt, cnt in pairs:
            X[i, bkt] = cnt
    w, b, _ = train_perceptron(X, y, epochs)
    wdf = spark.createDataFrame(
        [(i, int(w[i])) for i in range(CLS_BUCKETS)], "bucket INT, wt BIGINT"
    )
    scored = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("wt").cast("long").alias("dot"),
        )
    )
    has_f = F.col("n_features").isNotNull()
    return labeled.join(scored, "doc_id", "left").select(
        "doc_id",
        "seed_label",
        F.coalesce("n_features", F.lit(0).cast("long")).alias("n_features"),
        F.when(has_f, (F.col("dot") + F.lit(b)).cast("long")).alias("score"),
        F.coalesce(F.when(has_f, F.col("dot") + F.lit(b) > 0), F.lit(False)).alias(
            "keep"
        ),
    )


def old_pagerank_event_graph(spark, sf_dir):
    """Pre-r11 form: 10 distributed rank rounds with per-round eager
    checkpoints over the vocabulary-sized rank vector."""
    from pyspark.sql import Window as W

    from martian_moments_spark.plans.queries_events import (
        _PR_DAMP_DEN,
        _PR_DAMP_NUM,
        _PR_ITERS,
        _PR_SCALE,
    )

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.withColumn("prev_type", F.lag("event_type").over(w))
    edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        events.select(F.col("event_type").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    base = (15 * _PR_SCALE) // (_PR_DAMP_DEN * n_nodes)
    ranks = nodes.withColumn(
        "rank", F.lit(_PR_SCALE // n_nodes).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, F.col("src") == F.col("node"))
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * w) DIV out_w").alias("part"),
            )
            .groupBy("node")
            .agg(F.sum("part").cast("long").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({_PR_DAMP_NUM} * coalesce(c, 0L)) DIV {_PR_DAMP_DEN}")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("rank").alias("pagerank_units"),
        (F.col("rank").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    ).orderBy(F.col("pagerank_units").desc(), "event_type")


def old_contract_check_summary(spark, sf_dir):
    """Pre-r11 form: serial per-table contract walk (no driver-side
    job overlap)."""
    from martian_moments_spark.catalog import load as _load
    from martian_moments_spark.contracts import CONTRACTS, run_checks
    from martian_moments_spark.quality import CheckResult, relationship_violations

    out = []
    for c in CONTRACTS:
        df = _load(spark, sf_dir, c.table)
        for r in run_checks(
            df,
            not_null=c.not_null,
            accepted=c.accepted,
            expressions=c.expressions,
            unique=c.unique,
        ):
            out.append((c.table, r))
        for col, (ptable, pcol) in c.relationships.items():
            parent = _load(spark, sf_dir, ptable)
            out.append(
                (
                    c.table,
                    CheckResult(
                        "relationships",
                        f"{col}->{ptable}.{pcol}",
                        relationship_violations(df, col, parent, pcol),
                    ),
                )
            )
    rows = [(t, r.check, r.column, r.violations, r.passed) for t, r in out]
    return spark.createDataFrame(
        rows,
        "table_name STRING, check_name STRING, target STRING, "
        "violations BIGINT, passed BOOLEAN",
    )


def old_triangle_count_copurchase(spark, sf_dir):
    """Pre-r11 form: io self-join pair generation (+ io checkpoint)
    and a materialized triangle checkpoint consumed by a 3-way roles
    union."""
    io = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ia = io.select("o", F.col("p").alias("a"))
    ib = io.select("o", F.col("p").alias("b"))
    e = (
        ia.join(ib, "o")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=True)
    adj = (
        oriented.groupBy(F.col("src").alias("v"))
        .agg(F.collect_list("dst").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    tri = (
        oriented.join(adj.select(F.col("v").alias("src"), F.col("nbrs").alias("nbrs_u")), "src")
        .join(adj.select(F.col("v").alias("dst"), F.col("nbrs").alias("nbrs_v")), "dst")
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.explode(F.array_intersect("nbrs_u", "nbrs_v")).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    roles = (
        tri.select(F.col("u").alias("part_id"))
        .unionAll(tri.select(F.col("v").alias("part_id")))
        .unionAll(tri.select(F.col("w").alias("part_id")))
    )
    deg2 = deg.select(F.col("v").alias("part_id"), "degree")
    return (
        roles.groupBy("part_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .join(deg2, "part_id")
        .select("part_id", "degree", "n_triangles")
    )


def _old_connected_components(vertices, edges, id_col="doc_id", max_iter=50, check_every=2):
    """Pre-r11 form: unkeyed sym checkpoint (re-shuffled every round)."""
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    frontier = labels
    for rnd in range(1, max_iter + 1):
        msgs = (
            sym.join(frontier, sym.src == frontier.v)
            .select(F.col("dst").alias("v"), "label")
            .groupBy("v")
            .agg(F.min("label").alias("nbr_min"))
        )
        upd = (
            labels.join(msgs, "v", "left")
            .select(
                "v",
                "label",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "new_label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        frontier = upd.filter(F.col("new_label") < F.col("label")).select(
            "v", F.col("new_label").alias("label")
        )
        labels = upd.select("v", F.col("new_label").alias("label"))
        if rnd % check_every == 0 or rnd == max_iter:
            if frontier.limit(1).count() == 0:
                break
    return labels.select(F.col("v").alias(id_col), F.col("label").alias("component_id"))


def old_dedup_connected_components(spark, sf_dir):
    """Pre-r11 combined form: no candidate-pair spread (anchorSpread
    never during build) + unkeyed sym checkpoint."""
    from martian_moments_spark.plans.queries_llm import _lsh_verified_pairs

    spark.conf.set("martian.textops.anchorSpread", "never")
    try:
        docs = load(spark, sf_dir, "documents").select("doc_id")
        return _old_connected_components(docs, _lsh_verified_pairs(spark, sf_dir))
    finally:
        spark.conf.unset("martian.textops.anchorSpread")


def old_quality_classifier_scores(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return _old_classifier_scores(docs)


def old_quality_tier_agreement(spark, sf_dir):
    from pyspark.sql import Window as _W  # noqa: F401

    from martian_moments_spark.llmops.lm import bigram_lm_scores, lm_gate
    from martian_moments_spark.llmops.textops import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    gate = docs.select("doc_id", lm_gate(tokens("text")).alias("gate_pass"))
    lm = bigram_lm_scores(docs).select("doc_id", F.col("keep").alias("lm_keep"))
    cls = _old_classifier_scores(docs).select("doc_id", F.col("keep").alias("cls_keep"))
    return (
        gate.join(lm, "doc_id")
        .join(cls, "doc_id")
        .groupBy("gate_pass", "lm_keep", "cls_keep")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("gate_pass", "lm_keep", "cls_keep")
    )


OLD_FORMS = {
    "pagerank_event_graph": old_pagerank_event_graph,
    "contract_check_summary": old_contract_check_summary,
    "triangle_count_copurchase": old_triangle_count_copurchase,
    "dedup_connected_components": old_dedup_connected_components,
    "quality_classifier_scores": old_quality_classifier_scores,
    "quality_tier_agreement": old_quality_tier_agreement,
    "repeated_char_spans": old_repeated_char_spans,
    "tpch_q18_large_volume_customers": old_tpch_q18,
    "corpus_curation": old_corpus_curation,
    "curation_to_training_mix": old_curation_to_training_mix,
    "lm_perplexity_filter": old_lm_perplexity_filter,
    "exact_substring_spans": old_exact_substring_spans,
}


def main() -> None:
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark(app_name="mm-r11-ab2")
    for n in names:
        new_fn = registry[n].fn
        old_fn = OLD_FORMS[n]
        for fn in (old_fn, new_fn, old_fn, new_fn):  # warm both arms
            consume(fn(spark, SF))
        runs = {"A_old": [], "B_new": []}
        arm_order = (("A_old", old_fn), ("B_new", new_fn))
        if os.environ.get("AB_ORDER") == "BA":
            arm_order = arm_order[::-1]
        for _ in range(PASSES):
            for key, fn in arm_order:
                t0 = time.perf_counter()
                consume(fn(spark, SF))
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
        with open(f"/tmp/r11_ab2_{n}.json", "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
