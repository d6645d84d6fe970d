"""Physical-plan pins for the late-round-3 additions: retrieval,
sketches, graph, temporal, and allocation shapes. Each pin is the
scale property the query's docstring claims."""

from __future__ import annotations

import pytest

from martian_moments_spark.plans import load_all
from tests.conftest import SF_DIR_ORACLE
from tests.test_plans import explain_str

REGISTRY = load_all()

PINNED = (
    "embedding_ann_filtered",
    "hybrid_retrieval_rrf",
    "heavy_hitters_cms",
    "quantile_sketch_accuracy",
    "incremental_quantile_merge",
    "multi_touch_attribution",
    "skyline_pareto_parts",
    "scd2_point_in_time_join",
    "gaps_islands_streaks",
    "doc_rarity_score",
)


@pytest.fixture(scope="module")
def plans(spark):
    return {n: explain_str(REGISTRY[n].fn(spark, SF_DIR_ORACLE)) for n in PINNED}


def test_no_cartesian_products(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_interval_and_temporal_joins_stay_equi(plans):
    """The 7-day attribution window and the SCD2 validity interval must
    be residual predicates on an equi-join (user/customer key), never a
    nested-loop theta join."""
    for name in ("multi_touch_attribution", "scd2_point_in_time_join"):
        assert "BroadcastNestedLoopJoin" not in plans[name], f"{name} went theta"
        assert (
            "SortMergeJoin" in plans[name]
            or "ShuffledHashJoin" in plans[name]
            or "BroadcastHashJoin" in plans[name]
        ), f"{name}: no hash/merge equi-join found"


def test_skyline_has_no_self_join_and_no_global_window(plans):
    plan = plans["skyline_pareto_parts"]
    # the quadratic NOT-EXISTS lives only in the oracle
    assert "SortMergeJoin" not in plan
    # the per-row windows must be hash-partitioned (bucket / price) —
    # a regression to one global price-ordered window would drop the
    # bucket exchange and show only SinglePartition
    assert "hashpartitioning(bucket" in plan, "bucket window lost its partitioning"
    assert "hashpartitioning(price_units" in plan, "same-price window unpartitioned"


def test_sketch_aggregates_are_partial(plans):
    """CMS build and histogram build must plan partial (map-side)
    aggregation before the exchange — the bounded-cells guarantee.
    Formatted plans spell partial aggregate functions as partial_*."""
    for name in ("heavy_hitters_cms", "quantile_sketch_accuracy",
                 "incremental_quantile_merge"):
        plan = plans[name]
        assert "partial_count" in plan or "partial_sum" in plan, (
            f"{name}: no map-side partial aggregation in plan"
        )


def test_retrieval_joins_broadcast_the_small_side(plans):
    # PQ LUT / filtered-ANN prefilter / hybrid fusion all broadcast
    for name in ("embedding_ann_filtered", "hybrid_retrieval_rrf"):
        assert "BroadcastHashJoin" in plans[name], f"{name}: no broadcast join"


def test_doc_rarity_reuses_the_token_exchange(plans):
    """The frequency aggregate and the re-join share the token key;
    AQE may or may not materialize the reuse at this scale, but the
    plan must not introduce a second scan of documents beyond the
    explode input and must keep both joins hash-based."""
    plan = plans["doc_rarity_score"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
