"""Every registered query with an oracle must hash-match it locally —
this mirrors the driver's t2 correctness gate at a smaller SF."""

from __future__ import annotations

import pytest

from martian_moments_spark.plans import load_all
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import compare, duckdb_con

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def oracle(request):
    con = duckdb_con(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR_ORACLE)
    opdf = oracle.execute(spec.oracle).fetchdf()
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()  # materialize a slice — plan must execute
