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
    tmp_dir: str | None = None,
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
    plus one tiny-file inference job — corpus size never matters.

    Spark-Connect-safe: the sampled docs go through a temp JSONL file
    and ``spark.read.json(path)`` — no ``.rdd`` (the classic-only API
    Connect lacks). Pass ``tmp_dir`` on a shared filesystem when the
    driver's local /tmp is not executor-visible (multi-node clusters);
    the file is sample-sized, never corpus-sized. Docs are compacted to
    one line each (pretty-printed JSON would straddle JSONL rows);
    non-parseable docs pass through newline-stripped so Spark applies
    its own corrupt-record handling, same as before.
    """
    import json as _json
    import os
    import tempfile
    import uuid

    spark: SparkSession = df.sparkSession
    frame = df.select(json_col)
    if order_col is not None:
        frame = df.select(order_col, json_col).orderBy(order_col)
    docs = [r[json_col] for r in frame.limit(sample_rows).collect() if r[json_col] is not None]
    if not docs:
        return StructType([])
    lines = []
    for d in docs:
        try:
            lines.append(_json.dumps(_json.loads(d), separators=(",", ":")))
        except (ValueError, TypeError):
            lines.append(" ".join(d.splitlines()))
    # no leading underscore/dot: Spark's file listing treats those as
    # hidden (metadata) files and would skip the sample entirely
    path = os.path.join(
        tmp_dir or tempfile.gettempdir(),
        f"mm-schema-sample-{uuid.uuid4().hex}.jsonl",
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    try:
        return spark.read.json(path).schema
    finally:
        os.remove(path)
