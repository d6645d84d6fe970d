"""Physical-plan pins for the session-4 additions (cross-doc span
dedup, BM25 retrieval, leakage-safe split). Each pin is the scale
property the query's docstring claims."""

from __future__ import annotations

import pytest

from martian_moments_spark.plans import load_all
from tests.conftest import SF_DIR_ORACLE
from tests.test_plans import explain_str

REGISTRY = load_all()

PINNED = (
    "cross_doc_ngram_spans",
    "bm25_probe_ranking",
    "leakage_safe_split",
    "reciprocal_nearest_neighbors",
    "interval_union_coverage",
    "event_state_run_lengths",
)


@pytest.fixture(scope="module")
def plans(spark):
    return {n: explain_str(REGISTRY[n].fn(spark, SF_DIR_ORACLE)) for n in PINNED}


def test_no_cartesian_products(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_bm25_broadcasts_probe_and_stats(plans):
    """Probe vocabulary (<= 5 terms) and the 1-row corpus-stats frame
    must reach the postings join as broadcasts — the corpus side never
    shuffles for them."""
    assert plans["bm25_probe_ranking"].count("BroadcastExchange") >= 2


def test_bm25_topk_is_two_phase(plans):
    """The per-term top-10 must run as salt-local then merge windows
    (two Window operators), never one reducer per probe term."""
    assert plans["bm25_probe_ranking"].count("Window") >= 2


def test_cross_doc_dup_join_is_equi(plans):
    """The duplicated-shingle membership test must be a hash-partition
    equi-join on the shingle hash, not any nested-loop form."""
    plan = plans["cross_doc_ngram_spans"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_cross_doc_coverage_is_interval_union(plans):
    """Coverage must be the lag-window interval union, not the old
    explode(sequence)+count_distinct shape: exactly one Generate (the
    shingle posexplode), a Window, and no distinct aggregate on
    exploded span indices. The per-doc agg rides the window's doc_id
    exchange, so the whole query needs at most 3 hash exchanges
    (shingle dup-agg, shingle hit-join side, doc_id window+agg)."""
    plan = plans["cross_doc_ngram_spans"]
    # the only Generate nodes are the shingle posexplode (evaluated in
    # the dup-agg and hit-join branches; formatted explain names each
    # node twice: tree + detail heading) — the old shape's 4-element
    # span explode would add a third node and its sequence() argument
    assert plan.count("Generate") <= 4, "span explode crept back in"
    # (expression-level sequence() inside the shingle lambda is fine;
    # the old shape's signature was a Generate over explode(sequence))
    assert "explode(sequence" not in plan
    assert "Window" in plan
    n_exch = plan.count("Arguments: hashpartitioning")
    assert 1 <= n_exch <= 3, f"{n_exch} hash exchanges"


def test_rle_and_coverage_share_one_user_shuffle(plans):
    """interval_union_coverage and event_state_run_lengths each claim
    a single user_id exchange feeding fused windows + rollup: at most
    2 shuffles total (window partitioning + final agg re-use), never
    one per window."""
    for name in ("interval_union_coverage", "event_state_run_lengths"):
        # formatted explain renders the partitioning on a separate
        # "Arguments:" detail line, not inline after "Exchange" — count
        # that line (as tools_plan_audit does), and require at least one
        # so a rendering change can't silently make the pin vacuous
        n_exch = plans[name].count("Arguments: hashpartitioning")
        assert 1 <= n_exch <= 2, f"{name}: {n_exch} hash exchanges"


def test_apportionment_sums_exactly_to_budget(spark):
    """The Hamilton allocation must hand out EXACTLY the budget —
    the property plain proportional rounding lacks."""
    from martian_moments_spark.plans.queries_llm import TOKEN_BUDGET

    rows = (
        REGISTRY["token_budget_apportionment"]
        .fn(spark, SF_DIR_ORACLE)
        .collect()
    )
    assert sum(r.final_alloc for r in rows) == TOKEN_BUDGET
    assert all(r.extra in (0, 1) for r in rows)


def test_reciprocal_pairs_are_symmetric_and_unique(spark):
    """Every RNN pair appears once with id_a < id_b."""
    rows = (
        REGISTRY["reciprocal_nearest_neighbors"].fn(spark, SF_DIR_ORACLE).collect()
    )
    assert rows, "no reciprocal pairs at test scale"
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
