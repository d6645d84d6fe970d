"""martian_moments_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline (acgerhold/martian-moments:
Kafka + Airflow + MinIO + Snowflake/dbt) as an idiomatic Spark
engine:

- ``session``    — SparkSession factory (AQE, UTC, tuned shuffle).
- ``catalog``    — table registry over the synthetic star schema.
- ``operators``  — composable DataFrame->DataFrame operator library
                   (relational, nested/JSON, incremental, quality).
- ``llmops``     — LLM-training-data operators: dedup (exact/minhash/
                   simhash/jaccard), similarity search, text analysis,
                   multimodal column plumbing.
- ``plans``      — the query registry: every operator from SURVEY.md §2
                   as a (spark, sf_dir) -> DataFrame callable paired
                   with a DuckDB oracle SQL string.
- ``streaming``  — Structured Streaming surface (file/kafka sources,
                   windows, watermarks, sessionization, foreachBatch
                   sinks, gap-detection feedback loop).
- ``pipelines``  — medallion flows (bronze -> silver -> gold) mirroring
                   the reference's flatten/star/mart/validation layers.
"""

__version__ = "0.1.0"
