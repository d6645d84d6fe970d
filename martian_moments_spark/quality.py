"""Data-quality assertions (SURVEY.md §2.12) — the dbt test surface
(not_null / unique / accepted_values / expression_is_true) as engine
checks, plus a runner that evaluates a suite in ONE pass.

Each check is a predicate → violation count. The runner unions the
checks into a single aggregate plan so a 100-check suite over a 100 TB
table is one scan, not 100 (conditional aggregation, the A3 pattern),
except ``unique`` which needs its own group-by per key set.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    check: str
    column: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def not_null_violations(col: str) -> Column:
    """dbt not_null (sources.yml:14-15 et al.)."""
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long")


def accepted_values_violations(col: str, values: Sequence) -> Column:
    """dbt accepted_values (sources.yml:144-146: rover_name ∈ {...})."""
    return F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(list(values)), 1).otherwise(0)
    ).cast("long")


def expression_violations(sql_predicate: str) -> Column:
    """dbt_utils.expression_is_true (sources.yml:150-152: sol >= 0;
    :160-162: img_src LIKE 'http%'). Violation = predicate false/null."""
    pred = F.expr(sql_predicate)
    return F.sum(F.when(pred, 0).otherwise(1)).cast("long")


def relationship_violations(
    df: DataFrame, col: str, parent_df: DataFrame, parent_col: str
) -> int:
    """dbt relationships (referential integrity): child rows whose
    non-NULL foreign key has no match in the parent key column. An
    anti-join on the key — the parent side reduces to its distinct
    keys first, so at 100 TB the join ships key digests, not parent
    rows, and AQE broadcasts bounded dimensions."""
    child = df.select(F.col(col).alias("__fk")).filter(F.col("__fk").isNotNull())
    parent = parent_df.select(F.col(parent_col).alias("__fk")).distinct()
    return child.join(parent, "__fk", "left_anti").count()


def unique_violations(df: DataFrame, cols: Sequence[str]) -> int:
    """dbt unique (sources.yml:40-42): rows beyond the first per key.
    Needs a shuffle on the key — kept out of the single-pass runner."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("v"))
        .first()
    )
    return int(dup["v"])


def run_checks(
    df: DataFrame,
    not_null: Sequence[str] = (),
    accepted: dict[str, Sequence] | None = None,
    expressions: dict[str, str] | None = None,
    unique: Sequence[Sequence[str]] = (),
) -> list[CheckResult]:
    """Evaluate a suite. All scalar checks fold into one aggregate
    (single scan); each unique-key check adds one group-by job."""
    aggs: list[Column] = []
    labels: list[tuple[str, str]] = []
    for c in not_null:
        aggs.append(not_null_violations(c).alias(f"nn_{c}"))
        labels.append(("not_null", c))
    for c, vals in (accepted or {}).items():
        aggs.append(accepted_values_violations(c, vals).alias(f"av_{c}"))
        labels.append(("accepted_values", c))
    for name, pred in (expressions or {}).items():
        aggs.append(expression_violations(pred).alias(f"ex_{name}"))
        labels.append(("expression_is_true", name))

    results: list[CheckResult] = []
    if aggs:
        row = df.agg(*aggs).first()
        results = [
            CheckResult(kind, col, int(row[i] or 0))
            for i, (kind, col) in enumerate(labels)
        ]
    for cols in unique:
        results.append(CheckResult("unique", ",".join(cols), unique_violations(df, cols)))
    return results


def observed_gate(
    df: DataFrame, keep: Column, name: str = "quality_gate"
):
    """Quality gate with SINGLE-PASS metrics: returns ``(kept_df,
    observation)`` where the Observation (Spark's observe() API)
    records total/kept/rejected row counts as a side effect of
    whatever action the caller runs on ``kept_df`` — a write sees its
    own reject counts without a second scan of the input.

    At 100 TB this is the difference between "write the gated corpus,
    then re-scan to count rejects" (two corpus passes) and one pass:
    the observe() aggregates ride the same physical plan as the
    write. Metrics are read with ``observation.get`` AFTER the action
    completes (it blocks until then).

    ``keep`` is any boolean Column; rows failing it are filtered out
    of the returned frame but still counted."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("n_rejected"),
    )
    return observed.filter(keep), obs
