"""HTTP JSON source with distributed fan-out (S1-S3, E4-E5).

The reference fans out one Airflow task per (rover, sol)
(photo_ingestion_dag.py:63 expand_kwargs) and each task does a
requests.get with a 30 s timeout, degrading errors to an empty
payload (src/ingestion/photos.py:6-21). In Spark the task list IS a
DataFrame and the fan-out is data parallelism: ``mapInPandas`` runs
the fetcher per Arrow batch on executors — per-key parallelism without
a scheduler hop. The transport is injectable so the operator is
testable offline (and so a rate-limited client can be swapped in).
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_TIMEOUT_S = 30  # the reference's requests.get timeout (photos.py:13)

Transport = Callable[[str], str]


def _default_transport(url: str) -> str:
    with urllib.request.urlopen(url, timeout=DEFAULT_TIMEOUT_S) as resp:  # pragma: no cover
        return resp.read().decode("utf-8")


def fetch_tasks(
    tasks: DataFrame,
    url_template: str,
    transport: Transport | None = None,
    result_col: str = "response",
) -> DataFrame:
    """Fan-out fetch: one HTTP GET per task row, url built from the
    row's columns (``url_template.format(**row)``). Errors degrade to
    an empty-JSON response (the reference's error→{"photos":[]} shape)
    instead of failing the job — per-record tolerance, X8.

    Returns the task columns + a ``response`` string column; parse it
    with from_json + an explicit schema (the bronze→silver contract).

    Scale: repartition the task frame to spread keys across executors;
    each partition fetches sequentially (politeness), partitions run
    in parallel."""
    fetch = transport or _default_transport
    fields = [f.name for f in tasks.schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                try:
                    body = fetch(url_template.format(**row))
                except Exception:
                    body = "{}"
                out.append({**row, result_col: body})
            yield pd.DataFrame(out, columns=fields + [result_col])

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(tasks.schema.fields) + [StructField(result_col, StringType())])
    return tasks.mapInPandas(gen, schema)
