"""Tagged transformation runner (S10) — the `dbt run --select tag:X`
analog (src/utils/dbt.py:4-28; tags 'flatten'/'aggregate',
src/config.py:27-28).

Models are named DataFrame-producing functions with tags and explicit
upstream deps. ``run_tag`` executes a tag group in dependency order;
materialization is either a temp view (the reference's silver
dims/facts/validation are views — SURVEY §3.4) or a parquet table
(its flatten + mart layers). The SURVEY §3.4 quirk — models tagged
'flatten-inner'/'normalize' never selected by the DAG's exact-match
tags — is fixed by construction here: deps run whether or not their
tags match, so a selection can never silently skip an upstream.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    fn: Callable[[SparkSession], DataFrame]
    tags: tuple[str, ...] = ()
    deps: tuple[str, ...] = ()
    materialized: str = "view"  # 'view' | 'table'


@dataclass
class ModelRunner:
    spark: SparkSession
    warehouse_dir: str
    models: dict[str, Model] = field(default_factory=dict)

    def register(
        self,
        name: str,
        fn: Callable[[SparkSession], DataFrame],
        tags: tuple[str, ...] = (),
        deps: tuple[str, ...] = (),
        materialized: str = "view",
    ) -> None:
        if name in self.models:
            raise ValueError(f"duplicate model {name!r}")
        self.models[name] = Model(name, fn, tags, deps, materialized)

    def _run_model(self, name: str, done: set[str]) -> None:
        if name in done:
            return
        model = self.models[name]
        for dep in model.deps:
            self._run_model(dep, done)
        df = model.fn(self.spark)
        if model.materialized == "table":
            path = os.path.join(self.warehouse_dir, name)
            df.write.mode("overwrite").parquet(path)
            self.spark.read.parquet(path).createOrReplaceTempView(name)
        else:
            df.createOrReplaceTempView(name)
        done.add(name)

    def run_tag(self, tag: str) -> list[str]:
        """Run every model carrying ``tag`` (deps first, any tag).
        Returns execution order."""
        done: set[str] = set()
        for name, m in self.models.items():
            if tag in m.tags:
                self._run_model(name, done)
        return [n for n in done]

    def run_all(self) -> list[str]:
        done: set[str] = set()
        for name in self.models:
            self._run_model(name, done)
        return [n for n in done]
