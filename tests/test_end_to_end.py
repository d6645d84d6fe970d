"""The switch-from-the-reference story, end to end on one session:
contract gate -> curated training mix -> exact dedup bookkeeping ->
deterministic split -> bounded shard export, then the serving side:
lakehouse ingestion with an incrementally-maintained rollup. Every
stage is a registered query or engine op verified on its own; this
pins that a user can run the WHOLE pipeline they run on the reference
today."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from martian_moments_spark import lakehouse as lh
from martian_moments_spark.contracts import contract_results
from martian_moments_spark.materialized import MaterializedRollup
from martian_moments_spark.plans import load_all
from martian_moments_spark.sources.object_store import write_training_shards
from tests.conftest import SF_DIR_ORACLE

REGISTRY = load_all()


def test_training_data_pipeline_end_to_end(spark, tmp_path):
    # 1. contracts gate the raw tables (events' accepted_values check
    #    reports real violations by design — the gate must SURFACE
    #    them, and every FK must hold)
    results = contract_results(spark, SF_DIR_ORACLE)
    fk = [r for _, r in results if r.check == "relationships"]
    assert fk and all(r.passed for r in fk)
    assert any(not r.passed for _, r in results)  # honest violations visible

    # 2. curation composite -> per-(split, lang) token budget
    mix = REGISTRY["curation_to_training_mix"].fn(spark, SF_DIR_ORACLE)
    budget = {(r["split"], r["lang"]): r["total_tokens"] for r in mix.collect()}
    assert sum(1 for (s, _l) in budget if s == "train") > 0

    # 3. dedup bookkeeping agrees with cluster stats: redundant docs
    #    counted by the diagnostic == rows exact dedup would drop
    stats = REGISTRY["dedup_cluster_stats"].fn(spark, SF_DIR_ORACLE)
    n_redundant = stats.agg(F.sum("n_redundant")).first()[0]
    docs = REGISTRY["text_quality_scores"].fn(spark, SF_DIR_ORACLE)
    total_docs = docs.count()
    clusters = REGISTRY["dedup_exact"].fn(spark, SF_DIR_ORACLE)  # one row per fingerprint
    kept = clusters.count()
    assert total_docs - kept == n_redundant
    assert clusters.agg(F.sum("n_copies")).first()[0] == total_docs

    # 4. deterministic split + bounded shard export of the train slice
    split = REGISTRY["deterministic_split"].fn(spark, SF_DIR_ORACLE)
    assert {r["split"] for r in split.collect()} <= {"train", "val", "test"}
    from martian_moments_spark.catalog import load as cat_load

    train_docs = cat_load(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    n_shards = write_training_shards(train_docs, out, rows_per_shard=200, order_col="doc_id")
    assert n_shards >= train_docs.count() // 200
    assert spark.read.json(out).count() == train_docs.count()

    # 5. serving side: ingest two increments into a lakehouse table and
    #    keep a per-lang token rollup fresh incrementally
    table = str(tmp_path / "corpus")
    scored = cat_load(spark, SF_DIR_ORACLE, "documents").select(
        "doc_id", "lang", F.length("text").cast("long").alias("n_chars")
    )
    lh.append(scored.filter("doc_id % 2 = 0"), table)
    mv = MaterializedRollup(
        source_table=table,
        rollup_table=str(tmp_path / "corpus_by_lang"),
        keys=["lang"],
        aggs={"n_docs": (F.count(F.lit(1)), "sum"), "chars": (F.sum("n_chars"), "sum")},
    )
    assert mv.refresh(spark)["mode"] == "full"
    lh.append(scored.filter("doc_id % 2 = 1"), table)
    assert mv.refresh(spark)["mode"] == "incremental"
    got = {r["lang"]: (r["n_docs"], r["chars"]) for r in mv.read(spark).collect()}
    want = {
        r["lang"]: (r["n"], r["c"])
        for r in scored.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c"))
        .collect()
    }
    assert got == want
    # time travel still shows the first increment alone
    assert lh.read_table(spark, table, version=0).count() == scored.filter("doc_id % 2 = 0").count()
