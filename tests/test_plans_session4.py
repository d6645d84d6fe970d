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
