"""Physical-plan pins for the TPC-H suite additions — the specific
scale properties each shape was chosen to exercise. A regression here
is a performance bug even while oracle parity stays green."""

from __future__ import annotations

import pytest

from martian_moments_spark.plans import load_all
from tests.conftest import SF_DIR_ORACLE
from tests.test_plans import explain_str

REGISTRY = load_all()

PINNED = (
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_checking",
    "tpch_q12_shipping_priority_classes",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_dominant_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_predicates",
)

# Q11/Q15/Q22 are excluded from the no-nested-loop sweep: their scalar
# subqueries deliberately plan a 1-row broadcast crossJoin (the
# engine's standard scalar pattern), which Spark renders as a
# BroadcastNestedLoopJoin over a single row.


@pytest.fixture(scope="module")
def plans(spark):
    return {n: explain_str(REGISTRY[n].fn(spark, SF_DIR_ORACLE)) for n in PINNED}


def test_no_cartesian_or_nested_loop(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested loop"


def test_q18_topk_is_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["tpch_q18_large_volume_customers"]


def test_q2_and_q21_topk_are_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["tpch_q2_min_cost_supplier"]
    assert "TakeOrderedAndProject" in plans["tpch_q21_waiting_suppliers"]


def test_q4_exists_is_a_semi_join(plans):
    plan = plans["tpch_q4_priority_checking"]
    assert "LeftSemi" in plan, "EXISTS did not decorrelate to a semi-join"


def test_q19_implied_predicates_reach_the_scans(plans):
    plan = plans["tpch_q19_disjunctive_predicates"]
    # part side: the brand IN-list must be in the scan's pushed filters
    assert "In(p_brand" in plan, "brand IN-list not pushed to the part scan"
    # lineitem side: the quantity envelope must be pushed
    assert "GreaterThanOrEqual(l_quantity,1.0" in plan, "qty lower bound not pushed"
    assert "LessThanOrEqual(l_quantity,30.0" in plan, "qty upper bound not pushed"
    assert "BroadcastHashJoin" in plan  # pruned part broadcasts


def test_q14_month_filter_pushed(plans):
    plan = plans["tpch_q14_promo_revenue"]
    assert "GreaterThanOrEqual(l_shipdate" in plan, "ship month not pushed to scan"
    assert "BroadcastHashJoin" in plan


def test_dims_broadcast_not_shuffled(plans):
    # every query that joins nation/supplier/part subsets must broadcast
    for name in (
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
    ):
        assert "BroadcastHashJoin" in plans[name], f"{name}: dims not broadcast"


def test_q13_left_outer_preserved(plans):
    # the zero-order customers only survive if the join stays left outer
    assert "LeftOuter" in plans["tpch_q13_customer_distribution"]


def test_q17_decorrelates_without_window(plans):
    # the per-part average must be a grouped aggregate re-joined to the
    # detail, not a window over the whole fact
    plan = plans["tpch_q17_small_quantity_revenue"]
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2
