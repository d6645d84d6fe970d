"""Sources/sinks layer: HTTP fan-out fetch, object-store routing,
bronze load tolerance, tagged model runner."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from martian_moments_spark.sources.http import fetch_tasks
from martian_moments_spark.sources.object_store import (
    bronze_load,
    route_for_filename,
    write_json_routed,
)
from martian_moments_spark.sources.runner import ModelRunner


def test_fetch_tasks_fan_out_and_error_degradation(spark):
    tasks = spark.createDataFrame(
        [("Perseverance", 10), ("Curiosity", 11), ("BROKEN", 12)],
        "rover STRING, sol INT",
    ).repartition(3)

    def fake_transport(url):
        if "BROKEN" in url:
            raise TimeoutError("simulated 30s timeout")
        return json.dumps({"url": url, "photos": [1, 2, 3]})

    out = fetch_tasks(
        tasks, "https://api/rovers/{rover}/photos?sol={sol}", transport=fake_transport
    )
    rows = {r["rover"]: r["response"] for r in out.collect()}
    assert json.loads(rows["Perseverance"])["url"].endswith("Perseverance/photos?sol=10")
    assert json.loads(rows["BROKEN"]) == {}  # error → empty payload, job survives


def test_route_for_filename_prefixes(spark):
    df = spark.createDataFrame(
        [
            ("mars_rover_photos_batch_1.json",),
            ("rover_coordinates_x.json",),
            ("mission_manifests_y.json",),
            ("random.json",),
        ],
        "filename STRING",
    )
    got = {r[0]: r[1] for r in df.select("filename", route_for_filename(F.col("filename"))).collect()}
    assert got["mars_rover_photos_batch_1.json"] == "photos"
    assert got["rover_coordinates_x.json"] == "coordinates"
    assert got["mission_manifests_y.json"] == "manifests"
    assert got["random.json"] == "unrouted"


def test_write_routed_and_bronze_load_tolerance(spark, tmp_path):
    base = str(tmp_path / "landing")
    df = spark.createDataFrame(
        [
            ("mars_rover_photos_a.json", 1),
            ("mission_manifests_b.json", 2),
        ],
        "filename STRING, payload INT",
    )
    write_json_routed(df, base)
    import os

    assert set(p for p in os.listdir(base) if p.startswith("route=")) == {
        "route=photos",
        "route=manifests",
    }

    # bronze load: one good file, one with a corrupt line
    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "mars_rover_photos_c.json", "w") as f:
        f.write(json.dumps({"id": 1, "v": "ok"}) + "\n")
        f.write("{not valid json\n")
    loaded = bronze_load(spark, [str(raw / "mars_rover_photos_c.json")], "id BIGINT, v STRING")
    rows = loaded.collect()
    assert len(rows) == 2
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["v"] == "ok" and good[0]["route"] == "photos"
    assert len(bad) == 1 and bad[0]["id"] is None  # record kept, not dropped


def test_model_runner_tag_selection_runs_deps(spark, tmp_path):
    """A tagged run must execute untagged upstreams (the SURVEY §3.4
    reference quirk — 'flatten-inner' models skipped by exact-match tag
    selection — fixed by construction)."""
    runner = ModelRunner(spark, str(tmp_path / "wh"))
    order = []

    def mk(name, sql):
        def fn(s):
            order.append(name)
            return s.sql(sql)

        return fn

    runner.register("base", mk("base", "SELECT 1 AS x"), tags=("flatten-inner",))
    runner.register(
        "silver",
        mk("silver", "SELECT x + 1 AS y FROM base"),
        tags=("flatten",),
        deps=("base",),
        materialized="table",
    )
    runner.register(
        "gold",
        mk("gold", "SELECT SUM(y) AS total FROM silver"),
        tags=("aggregate",),
        deps=("silver",),
    )
    runner.run_tag("flatten")
    assert order == ["base", "silver"]  # dep ran despite non-matching tag
    runner.run_tag("aggregate")
    assert spark.table("gold").first()["total"] == 2


def test_infer_json_schema_merges_heterogeneous_documents(spark):
    """Documents with disjoint field sets: inference must return the
    UNION of fields (with type widening), where row-1-only inference
    provably drops the later fields."""
    from pyspark.sql import functions as F

    from martian_moments_spark.functions.jsonio import infer_json_schema

    docs = [
        (1, '{"k": 1}'),
        (2, '{"k": 2, "extra": "x"}'),
        (3, '{"k": 3.5, "nested": {"a": true}}'),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, props STRING")

    merged = infer_json_schema(df, "props", order_col="doc_id")
    assert set(merged.fieldNames()) == {"k", "extra", "nested"}
    # type widening across documents: k saw 1 and 3.5 -> double
    assert merged["k"].dataType.typeName() == "double"

    # row-1-only inference (the anti-pattern) drops 'extra'
    first = spark.range(1).select(
        F.schema_of_json(F.lit(docs[0][1]))
    ).first()[0]
    assert "extra" not in first

    out = df.select(
        "doc_id", F.from_json("props", merged).getField("extra").alias("extra")
    ).collect()
    assert {r["doc_id"]: r["extra"] for r in out} == {1: None, 2: "x", 3: None}


def test_infer_json_schema_empty_and_null_docs(spark):
    from martian_moments_spark.functions.jsonio import infer_json_schema

    df = spark.createDataFrame([(1, None)], "doc_id BIGINT, props STRING")
    assert infer_json_schema(df, "props").fieldNames() == []


def test_write_training_shards_bounds_rows_and_orders(spark, tmp_path):
    """Every shard holds <= rows_per_shard rows; with order_col the
    shard key ranges are disjoint and increasing; content round-trips."""
    import json as _json
    import os

    from martian_moments_spark.sources.object_store import write_training_shards

    df = spark.range(0, 1000).selectExpr("id AS doc_id", "concat('t', id) AS text")
    out = str(tmp_path / "shards")
    n = write_training_shards(df, out, rows_per_shard=100, order_col="doc_id")
    assert n >= 10  # 1000 rows / 100 per shard

    files = sorted(
        f for f in os.listdir(out) if f.endswith(".json") and not f.startswith("_")
    )
    seen = []
    ranges = {}
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows = [_json.loads(l) for l in fh if l.strip()]
        assert len(rows) <= 100
        if rows:
            ids = [r["doc_id"] for r in rows]
            assert ids == sorted(ids)  # sorted within shard
            ranges[f] = (min(ids), max(ids))
            seen.extend(ids)
    assert sorted(seen) == list(range(1000))  # lossless
    # range partitioning: file key ranges do not interleave
    spans = sorted(ranges.values())
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_csv_bronze_load_tolerates_malformed_rows(spark, tmp_path):
    """CSV ingestion keeps the bronze discipline: malformed rows land
    in the corrupt column with the raw line preserved; good rows parse;
    lineage columns attach."""
    from martian_moments_spark.sources.object_store import csv_bronze_load

    p = tmp_path / "manifest_batch1.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,notanumber\n"   # qty fails the INT cast -> corrupt
        "3,gamma,30\n"
    )
    df = csv_bronze_load(spark, [str(p)], "id INT, name STRING, qty INT")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["qty"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[3]["qty"] == 30
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "notanumber" in bad[0]["_corrupt_record"]
    assert all(r["source_file"] == "manifest_batch1.csv" for r in rows.values())


def test_write_training_shards_orc_and_csv(spark, tmp_path):
    from martian_moments_spark.sources.object_store import write_training_shards

    df = spark.range(0, 100).selectExpr("id AS doc_id", "concat('t', id) AS text")
    n_orc = write_training_shards(df, str(tmp_path / "o"), rows_per_shard=40, fmt="orc")
    assert n_orc >= 3
    assert spark.read.orc(str(tmp_path / "o")).count() == 100
    n_csv = write_training_shards(df, str(tmp_path / "c"), rows_per_shard=40, fmt="csv")
    assert n_csv >= 3
    back = spark.read.option("header", "true").csv(str(tmp_path / "c"))
    assert back.count() == 100
