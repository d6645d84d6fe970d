"""Registry-wide plan-shape gate: the hard flags from
tools_plan_audit.py enforced in CI — NO query may plan a
CartesianProduct or a row-at-a-time Python UDF (BatchEvalPython).
Arrow seams (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython)
are the only Python boundaries allowed."""

from __future__ import annotations

import pytest

from martian_moments_spark.plans import load_all
from tests.conftest import SF_DIR_SMALL
from tests.test_plans import explain_str

REGISTRY = load_all()


@pytest.fixture(scope="module")
def all_plans(spark):
    return {
        name: explain_str(spec.fn(spark, SF_DIR_SMALL))
        for name, spec in sorted(REGISTRY.items())
    }


def test_no_cartesian_product_anywhere(all_plans):
    bad = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not bad, f"CartesianProduct planned by: {bad}"


def test_no_row_at_a_time_python_udf_anywhere(all_plans):
    bad = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF planned by: {bad}"
