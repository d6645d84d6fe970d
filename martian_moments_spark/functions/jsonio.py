"""JSON schema inference over document samples.

The VARIANT fallback path (SURVEY §1.3, N1): when no explicit
StructType contract exists, the schema is inferred from DATA — and it
must be inferred from a *union* of documents, not a single row.
Document shapes vary (that is the whole reason VARIANT exists);
row-1-only inference silently drops every field absent from row 1 for
every row. Reference analog: the loader accepts arbitrary JSON
documents per batch (src/utils/snowflake.py:45-51) — Snowflake's
VARIANT columns never pre-commit to one row's shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def infer_json_schema(
    df: DataFrame,
    json_col: str,
    sample_rows: int = 64,
    order_col: str | None = None,
) -> StructType:
    """Infer a merged schema from a bounded, deterministic sample of
    JSON documents.

    Takes the first ``sample_rows`` documents (by ``order_col`` when
    given — deterministic sample; otherwise whatever LIMIT yields) and
    runs Spark's own JSON schema inference over ALL of them, so the
    result is the union of every sampled document's fields with
    type widening (long + double -> double, conflicting -> string) —
    exactly what a full-scan ``spark.read.json`` would do, at sample
    cost. Fields rarer than 1/sample_rows can still be missed: raise
    ``sample_rows`` or supply an explicit contract schema for those.

    Scale: one LIMIT scan (driver collects ``sample_rows`` strings)
    plus a driver-local inference job — corpus size never matters.
    """
    spark: SparkSession = df.sparkSession
    frame = df.select(json_col)
    if order_col is not None:
        frame = df.select(order_col, json_col).orderBy(order_col)
    docs = [r[json_col] for r in frame.limit(sample_rows).collect() if r[json_col] is not None]
    if not docs:
        return StructType([])
    sample_df = spark.createDataFrame([(d,) for d in docs], "doc STRING")
    return spark.read.json(sample_df.rdd.map(lambda r: r.doc)).schema
