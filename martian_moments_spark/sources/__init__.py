"""Sources & sinks (SURVEY.md §2.1 S1-S10).

The reference's ingestion/load plumbing re-expressed Spark-side:
HTTP fan-out fetching (S1-S3/E4), object-store JSON routing (S4/S6),
and the tagged transformation runner replacing `dbt run --select
tag:...` (S10). S5 (JSON→JSONL rewriting) needs no operator at all:
``spark.read.json`` reads JSONL natively and ``multiLine=True`` reads
whole-document JSON.
"""

from martian_moments_spark.sources.http import fetch_tasks  # noqa: F401
from martian_moments_spark.sources.object_store import (  # noqa: F401
    bronze_load,
    route_for_filename,
    write_json_routed,
)
from martian_moments_spark.sources.runner import ModelRunner  # noqa: F401
