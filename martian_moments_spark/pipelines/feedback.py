"""Gap-detection → backfill-scheduling feedback loop (SURVEY E6).

The reference's closed loop: an anti-join view finds (rover, sol)
grains present in the manifest but missing from ingested photos
(validation_photo_gaps.sql:54-59); a LIMIT-200 batch becomes an
ingestion-schedule Kafka message {tasks[], sol_range[]}
(src/utils/snowflake.py:68-113); ingestion fills the gaps; the next
dbt run re-evaluates the view — until no gaps remain. This is the
reference's late/missing-data mechanism (it has no watermarks).

Here the loop is a driver-side ``while`` over DataFrames: gaps are an
anti-join (shuffles on the grain key only — the engine's cheapest
possible reconciliation at 100 TB when both sides are bucketed on the
key), the schedule envelope is plain Python (driver-scale: ≤ batch
rows), and "ingestion" is a caller-supplied callback so the loop is
testable without a network.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE = 200  # the reference's BATCH_SIZE (src/config.py:32)


def detect_gaps(
    expected: DataFrame, actual: DataFrame, keys: list[str], batch_size: int = DEFAULT_BATCH_SIZE
) -> DataFrame:
    """Expected grains with no matching actual rows — LEFT JOIN +
    IS NULL expressed as a first-class left_anti join (J4), ordered for
    deterministic batching (validation_photo_gaps.sql:62 ORDER BY sol)
    and capped at the scheduling batch size (LIMIT 200,
    src/utils/snowflake.py:76)."""
    return (
        expected.select(*keys)
        .join(actual.select(*keys), keys, "left_anti")
        .orderBy(*keys)
        .limit(batch_size)
    )


def schedule_envelope(gaps: list[dict[str, Any]], range_key: str) -> dict[str, Any]:
    """The ingestion-schedule message shape
    {ingestion_schedule: {tasks[], sol_range[]}, status, timestamp}
    (src/utils/snowflake.py:90-113): tasks verbatim, range = contiguous
    span of the batch's range_key (list(range(min, max+1)),
    snowflake.py:94)."""
    if not gaps:
        return {"ingestion_schedule": {"tasks": [], "sol_range": []}, "status": "empty"}
    vals = [g[range_key] for g in gaps]
    return {
        "ingestion_schedule": {
            "tasks": gaps,
            "sol_range": list(range(min(vals), max(vals) + 1)),
        },
        "status": "generated",
    }


def feedback_rounds(
    expected: DataFrame,
    actual: DataFrame,
    keys: list[str],
    ingest: Callable[[list[dict[str, Any]]], DataFrame],
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_rounds: int = 100,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Run the closed loop: detect → schedule → ingest(tasks) → union
    into actual → repeat, until no gaps or max_rounds. Returns the
    final actual DataFrame and the per-round schedule envelopes.

    ``ingest`` maps a task batch to the rows it backfills (in the
    reference: the NASA-API fetch + MinIO + COPY path)."""
    envelopes: list[dict[str, Any]] = []
    for _ in range(max_rounds):
        batch = [r.asDict() for r in detect_gaps(expected, actual, keys, batch_size).collect()]
        if not batch:
            break
        envelopes.append(schedule_envelope(batch, keys[-1]))
        actual = actual.unionByName(ingest(batch).select(*actual.columns))
    return actual, envelopes
