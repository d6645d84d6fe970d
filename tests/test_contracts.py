"""Declarative table contracts: one config drives Spark evaluation and
the generated DuckDB oracle; violations must surface, never hide."""

from __future__ import annotations

import duckdb

from martian_moments_spark.contracts import (
    CONTRACTS,
    TableContract,
    contract_results,
    sql_contract_summary,
)

SF_DIR = "/root/testdata/sf0.001"


def test_contracts_cover_multiple_tables_and_find_known_violations(spark):
    results = contract_results(spark, SF_DIR)
    tables = {t for t, _ in results}
    assert {"orders", "lineitem", "events", "documents"} <= tables
    by_key = {(t, r.check, r.column): r.violations for t, r in results}
    # the deliberately-strict events domain reports the 'purchase' rows
    assert by_key[("events", "accepted_values", "event_type")] > 0
    # keys declared not_null really are
    assert by_key[("orders", "not_null", "o_orderkey")] == 0


def test_contract_spark_matches_generated_oracle(spark):
    from martian_moments_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    oracle = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(sql_contract_summary()).fetchall()
    }
    got = {
        (t, r.check, r.column): (r.violations, r.passed)
        for t, r in contract_results(spark, SF_DIR)
    }
    assert got == oracle


def test_injected_violation_is_detected(spark):
    """A contract over a frame with a planted null + duplicate + out-of-
    domain value must count each exactly once."""
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "x"), (2, "c", "zzz")],
        "id BIGINT, name STRING, kind STRING",
    )
    c = TableContract(
        table="t",
        not_null=("name",),
        accepted={"kind": ("x", "y")},
        unique=(("id",),),
    )
    from martian_moments_spark.quality import run_checks

    got = {
        (r.check, r.column): r.violations
        for r in run_checks(
            df, not_null=c.not_null, accepted=c.accepted, unique=c.unique
        )
    }
    assert got == {
        ("not_null", "name"): 1,
        ("accepted_values", "kind"): 1,
        ("unique", "id"): 1,
    }


def test_contract_declarations_are_well_formed():
    for c in CONTRACTS:
        assert c.not_null or c.accepted or c.expressions or c.unique
        for cols in c.unique:
            assert cols, f"{c.table}: empty unique key"


def test_relationship_check_counts_orphans(spark):
    """dbt relationships: non-NULL FKs without a parent match count as
    violations; NULL FKs never do."""
    from martian_moments_spark.quality import relationship_violations

    child = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, None)], "id BIGINT, fk BIGINT"
    )
    parent = spark.createDataFrame([(10,), (11,), (12,)], "pk BIGINT")
    assert relationship_violations(child, "fk", parent, "pk") == 1  # only 99


def test_catalog_contracts_fk_integrity_holds(spark):
    """The star schema's declared FKs all hold in the testdata, and
    the generated oracle agrees branch-for-branch."""
    import duckdb

    from martian_moments_spark.contracts import (
        CONTRACTS,
        contract_results,
        sql_contract_summary,
    )
    from tests.conftest import SF_DIR_ORACLE
    from tests.oracle_utils import duckdb_con

    got = {
        (t, r.check, r.column): r.violations
        for t, r in contract_results(spark, SF_DIR_ORACLE)
        if r.check == "relationships"
    }
    assert len(got) == 5  # the five declared FKs
    assert all(v == 0 for v in got.values())

    con = duckdb_con(SF_DIR_ORACLE)
    oracle = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(sql_contract_summary()).fetchall()
        if r[1] == "relationships"
    }
    con.close()
    assert oracle == got
