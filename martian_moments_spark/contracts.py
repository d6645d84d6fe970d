"""Declarative per-table quality contracts — the dbt ``sources.yml``
schema-test registry (reference: sources.yml:133-236, where every
source column declares not_null / unique / accepted_values /
expression tests) as engine configuration.

One ``TableContract`` per catalog table declares its checks; the same
declaration drives BOTH the Spark evaluation (quality.run_checks — one
conditional-aggregation scan per table plus one group-by per unique
key) and the generated DuckDB oracle SQL (``sql_contract_summary``),
so the contract is a single source of truth with an exact cross-engine
check on its own evaluation.

Expressions are written in the ANSI subset both engines parse
identically (comparisons, IS NULL, LIKE, arithmetic).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from martian_moments_spark.quality import run_checks


@dataclass(frozen=True)
class TableContract:
    table: str
    not_null: tuple[str, ...] = ()
    accepted: dict[str, tuple] = field(default_factory=dict)
    expressions: dict[str, str] = field(default_factory=dict)
    unique: tuple[tuple[str, ...], ...] = ()
    #: dbt relationships: fk column -> (parent table, parent key col)
    relationships: dict[str, tuple[str, str]] = field(default_factory=dict)


#: The engine's standing contracts for the catalog tables it curates.
#: Shapes mirror the reference's source declarations: key not_null +
#: unique (sources.yml:40-42), categorical accepted_values
#: (sources.yml:144-146), sign/shape expressions (sources.yml:150-162).
CONTRACTS: tuple[TableContract, ...] = (
    TableContract(
        table="orders",
        not_null=("o_orderkey", "o_custkey"),
        accepted={"o_orderstatus": ("F", "O", "P")},
        expressions={"nonnegative_price": "o_totalprice >= 0"},
        unique=(("o_orderkey",),),
        relationships={"o_custkey": ("customer", "c_custkey")},
    ),
    TableContract(
        table="lineitem",
        not_null=("l_orderkey", "l_linenumber"),
        expressions={
            "positive_quantity": "l_quantity > 0",
            "nonnegative_extendedprice": "l_extendedprice >= 0",
        },
        unique=(("l_orderkey", "l_linenumber"),),
        relationships={
            "l_orderkey": ("orders", "o_orderkey"),
            "l_partkey": ("part", "p_partkey"),
            "l_suppkey": ("supplier", "s_suppkey"),
        },
    ),
    TableContract(
        table="events",
        not_null=("event_id", "user_id", "ts"),
        # Deliberately stricter than the data: 'purchase' events exist,
        # so this check reports real violations — the summary must
        # surface them, not hide them.
        accepted={"event_type": ("click", "view", "error", "signup")},
        unique=(("event_id",),),
        relationships={"user_id": ("customer", "c_custkey")},
    ),
    TableContract(
        table="documents",
        not_null=("doc_id", "text", "source"),
        expressions={"nonnegative_length": "n_chars >= 0"},
        unique=(("doc_id",),),
    ),
)


def contract_results(spark, sf_dir: str, contracts: Sequence[TableContract] = CONTRACTS):
    """Evaluate every contract: [(table, CheckResult), ...]. Scalar
    checks (not_null / accepted / expression) fold into ONE
    conditional-agg scan per table; each unique key adds one group-by
    job and each declared relationship one anti-join job — joins
    cannot fold into a scan, so job count is bounded by
    tables + unique keys + relationships (never by scalar check
    count). At 100 TB, FK checks against the same child table share
    its scan only if the storage layer caches it — declare only the
    FKs worth their join."""
    from concurrent.futures import ThreadPoolExecutor

    from martian_moments_spark.catalog import load

    from martian_moments_spark.quality import CheckResult, relationship_violations

    def one_table(c: TableContract) -> list:
        rows = []
        df = load(spark, sf_dir, c.table)
        for r in run_checks(
            df,
            not_null=c.not_null,
            accepted=c.accepted,
            expressions=c.expressions,
            unique=c.unique,
        ):
            rows.append((c.table, r))
        for col, (ptable, pcol) in c.relationships.items():
            parent = load(spark, sf_dir, ptable)
            rows.append(
                (
                    c.table,
                    CheckResult(
                        "relationships",
                        f"{col}->{ptable}.{pcol}",
                        relationship_violations(df, col, parent, pcol),
                    ),
                )
            )
        return rows

    # Per-table suites are independent jobs whose driver actions were
    # previously awaited serially; a small thread pool lets the next
    # table's tasks back-fill executors freed by the current table's
    # tail (guide §2.6 "overlap independent jobs"). pool.map preserves
    # declaration order, so the emitted rows — and every consumer's
    # result — are byte-identical to the serial walk.
    #
    # load() flips the session-global nanos conf when it reads the
    # events table; under the pool the OTHER tables' reads could
    # observe that conf in a schedule-dependent order (ADVICE r11).
    # Pin it once before any thread reads, so every parquet scan sees
    # the identical session conf regardless of thread interleaving.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with ThreadPoolExecutor(max_workers=min(4, max(1, len(contracts)))) as pool:
        return [row for rows in pool.map(one_table, contracts) for row in rows]


def _sql_violation_exprs(c: TableContract) -> list[tuple[str, str, str]]:
    """(check_name, target, scalar-violations SQL) per declared check."""
    out: list[tuple[str, str, str]] = []
    for col in c.not_null:
        out.append(
            (
                "not_null",
                col,
                f"SELECT CAST(COALESCE(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0) "
                f"AS BIGINT) FROM {c.table}",
            )
        )
    for col, vals in c.accepted.items():
        lit = ", ".join(f"'{v}'" for v in vals)
        out.append(
            (
                "accepted_values",
                col,
                f"SELECT CAST(COALESCE(SUM(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({lit}) "
                f"THEN 1 ELSE 0 END), 0) AS BIGINT) FROM {c.table}",
            )
        )
    for name, pred in c.expressions.items():
        out.append(
            (
                "expression_is_true",
                name,
                f"SELECT CAST(COALESCE(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END), 0) "
                f"AS BIGINT) FROM {c.table}",
            )
        )
    for cols in c.unique:
        key = ", ".join(cols)
        out.append(
            (
                "unique",
                ",".join(cols),
                f"SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM "
                f"(SELECT COUNT(*) AS n FROM {c.table} GROUP BY {key}) WHERE n > 1",
            )
        )
    for col, (ptable, pcol) in c.relationships.items():
        out.append(
            (
                "relationships",
                f"{col}->{ptable}.{pcol}",
                f"SELECT CAST(COALESCE(SUM(CASE WHEN {col} IS NOT NULL "
                f"AND {col} NOT IN (SELECT {pcol} FROM {ptable} "
                f"WHERE {pcol} IS NOT NULL) THEN 1 ELSE 0 END), 0) "
                f"AS BIGINT) FROM {c.table}",
            )
        )
    return out


def sql_contract_summary(contracts: Sequence[TableContract] = CONTRACTS) -> str:
    """DuckDB oracle for ``contract_results``: one UNION ALL branch per
    declared check, long-form (table_name, check_name, target,
    violations, passed)."""
    branches = []
    for c in contracts:
        for check, target, sub in _sql_violation_exprs(c):
            branches.append(
                f"SELECT '{c.table}' AS table_name, '{check}' AS check_name, "
                f"'{target}' AS target, ({sub}) AS violations"
            )
    body = "\n        UNION ALL ".join(branches)
    return (
        "SELECT table_name, check_name, target, violations, "
        "(violations = 0) AS passed FROM (\n        "
        + body
        + "\n        )"
    )
