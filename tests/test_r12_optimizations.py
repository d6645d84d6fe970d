"""Equivalence tests for the round-12 optimizations: each rewrite must
produce results identical to the form it replaced (the optimization
contract — speed changes, answers never)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tests.conftest import SF_DIR_SMALL


# ---------------------------------------------------------------- #
# _topk_stable: argpartition selection == stable-argsort prefix     #
# ---------------------------------------------------------------- #


def _reference(neg, kk1):
    return np.argsort(neg, axis=1, kind="stable")[:, :kk1]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_topk_stable_matches_stable_argsort(seed):
    from martian_moments_spark.llmops.similarity import _topk_stable

    rng = np.random.default_rng(seed)
    # heavy ties: values drawn from a tiny set, so the k-th boundary is
    # almost always tied — the case argpartition alone gets wrong
    neg = rng.choice([-1.0, -0.5, -0.5, 0.0, 0.25], size=(37, 53))
    # adversarial cells: -inf self-marks, NaN zero-norm columns
    neg[rng.random(neg.shape) < 0.05] = -np.inf
    neg[rng.random(neg.shape) < 0.05] = np.nan
    for kk1 in (1, 3, 7, 52, 53, 60):
        got = _topk_stable(neg.copy(), kk1)
        want = _reference(neg, kk1)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want, err_msg=f"kk1={kk1}")


def test_topk_stable_all_nan_and_all_equal_rows():
    from martian_moments_spark.llmops.similarity import _topk_stable

    neg = np.full((3, 9), np.nan)
    neg[1, :] = 0.5  # all-equal row: ties everywhere
    neg[2, :4] = -np.inf  # fewer non-NaN than kk1
    neg[2, 4:] = np.nan
    for kk1 in (2, 6, 9):
        np.testing.assert_array_equal(
            _topk_stable(neg.copy(), kk1), _reference(neg, kk1)
        )


# ---------------------------------------------------------------- #
# Arrow deletion-signature kernel == JVM expression backend          #
# ---------------------------------------------------------------- #


def test_deletion_sig_kernel_candidate_parity(spark):
    """The Arrow rolling-hash kernel and the JVM explode backend must
    nominate the IDENTICAL candidate pair set (equal variants hash
    equal under both; 64-bit hash collisions are the only divergence
    and are 2^-64-scale)."""
    from martian_moments_spark.llmops.dedup import deletion_neighborhood_candidates

    rows = [
        (1, 1, "hello world"),
        (1, 2, "hallo world"),  # ed 1 of 1
        (1, 3, "hello worl"),  # ed 1 of 1
        (1, 4, "completely different"),
        (1, 5, "hello world"),  # exact dup of 1
        (1, 6, ""),  # empty
        (1, 7, "a"),
        (1, 8, "ab"),
        (1, 9, "b"),
        (1, 10, "naïve café"),  # multi-byte chars
        (1, 11, "naive café"),  # ed 1 of 10
        (1, 12, "aaaaaa"),  # repeated chars: duplicate variants
        (1, 13, "aaaa"),  # ed 2 of 12
        (2, 14, "hello world"),  # other block: must NOT pair with 1
        (2, 15, "hello wörld"),
        (None, 16, "null block dropped"),
        (1, 17, None),  # null text dropped
    ]
    df = spark.createDataFrame(rows, "blk INT, id BIGINT, name STRING")

    def run(mode):
        spark.conf.set("martian.dedup.deletionSigKernel", mode)
        try:
            out = deletion_neighborhood_candidates(
                df, block_col="blk", id_col="id", text_col="name", k=2
            ).collect()
        finally:
            spark.conf.unset("martian.dedup.deletionSigKernel")
        return sorted((r["block"], r["id_a"], r["id_b"]) for r in out)

    jvm = run("jvm")
    arrow = run("arrow")
    assert arrow == jvm
    got = {(a, b) for _, a, b in arrow}
    # recall sanity: every true <=2-edit pair is nominated
    for must in [(1, 2), (1, 3), (1, 5), (2, 3), (2, 5), (3, 5), (7, 8),
                 (7, 9), (8, 9), (6, 7), (6, 9), (6, 8), (10, 11), (12, 13)]:
        assert must in got, f"missing true pair {must}"
    assert not any(a == 14 or b == 14 for a, b in got if (a, b) != (14, 15)), (
        "cross-block pair leaked"
    )


def test_deletion_sig_kernel_on_small_sf(spark):
    """Backend parity on the real customer table at sf0.001."""
    from martian_moments_spark.catalog import load
    from martian_moments_spark.llmops.dedup import deletion_neighborhood_candidates

    c = load(spark, SF_DIR_SMALL, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )

    def run(mode):
        spark.conf.set("martian.dedup.deletionSigKernel", mode)
        try:
            out = deletion_neighborhood_candidates(
                c, block_col="c_nationkey", id_col="c_custkey", text_col="c_name"
            ).collect()
        finally:
            spark.conf.unset("martian.dedup.deletionSigKernel")
        return sorted((r["block"], r["id_a"], r["id_b"]) for r in out)

    assert run("arrow") == run("jvm")


# weighted_median_per_group's two-phase range-bucketed draft was
# MEASURED-REJECTED (0.79x/0.86x both arm orders, 0.84x with phase-1
# checkpointed — tools_r12_ab.py `wm`) and reverted to the attested
# single-window form; the equivalence tests that pinned the draft left
# with it. The rejection rationale lives in the query docstring.


# ---------------------------------------------------------------- #
# connected_components: two-hop fused rounds == single-hop loop      #
# ---------------------------------------------------------------- #


@pytest.mark.parametrize("seed", [0, 7])
def test_cc_two_hop_matches_single_hop(spark, seed):
    """The fused two-hop rounds must reach the identical fixpoint as
    the single-hop loop (min reachable id per vertex), including on
    long paths (worst-case diameter) and isolated vertices."""
    import random

    from martian_moments_spark.llmops.dedup import connected_components

    rng = random.Random(seed)
    n = 60
    edges = []
    # a long path (diameter stress), a dense clique, random noise
    for i in range(20):
        edges.append((i, i + 1))
    for i in range(30, 36):
        for j in range(i + 1, 36):
            edges.append((i, j))
    for _ in range(25):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    vdf = spark.createDataFrame([(i,) for i in range(n)], "doc_id BIGINT")
    edf = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")

    def run(two_hop: str):
        spark.conf.set("martian.dedup.ccTwoHop", two_hop)
        try:
            out = connected_components(vdf, edf).collect()
        finally:
            spark.conf.unset("martian.dedup.ccTwoHop")
        return sorted((r["doc_id"], r["component_id"]) for r in out)

    fused = run("true")
    single = run("false")
    assert fused == single
    # and both equal the brute-force transitive closure
    import itertools

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted((i, find(i)) for i in range(n))
    assert fused == want


# ---------------------------------------------------------------- #
# spread_scan byte cap                                               #
# ---------------------------------------------------------------- #


def test_spread_scan_byte_cap_and_modes(spark):
    from martian_moments_spark.catalog import load
    from martian_moments_spark.operators import parallelize as P

    li = load(spark, SF_DIR_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    para = spark.sparkContext.defaultParallelism
    key = SF_DIR_SMALL + ":lineitem"

    P.reset_probe_memo()
    try:
        # never: identity
        spark.conf.set("martian.parallelize.spreadScan", "never")
        assert P.spread_scan(li, key, "l_orderkey") is li

        # uncapped (r11 behavior): full session parallelism
        spark.conf.set("martian.parallelize.spreadScan", "always")
        spark.conf.set("martian.parallelize.bytesPerSlot", "0")
        assert P.spread_scan(li, key, "l_orderkey").rdd.getNumPartitions() == para

        # capped: the sf0.001 projection is far under minSlots * 1 MiB,
        # so the target collapses to the floor, never the core count
        spark.conf.set("martian.parallelize.spreadScan", "always")
        spark.conf.set("martian.parallelize.bytesPerSlot", str(1 << 20))
        spark.conf.set("martian.parallelize.minSlots", "4")
        n = P.spread_scan(li, key, "l_orderkey").rdd.getNumPartitions()
        assert n == min(4, para)
    finally:
        for k in (
            "martian.parallelize.spreadScan",
            "martian.parallelize.bytesPerSlot",
            "martian.parallelize.minSlots",
        ):
            spark.conf.unset(k)
        P.reset_probe_memo()


def test_probe_memo_fingerprint_keys(spark):
    from martian_moments_spark.catalog import load
    from martian_moments_spark.operators import parallelize as P

    li = load(spark, SF_DIR_SMALL, "lineitem").select("l_orderkey")
    P.reset_probe_memo()
    try:
        P.spread_scan(li, SF_DIR_SMALL + ":lineitem", "l_orderkey")
        keys = list(P._PROBE_MEMO)
        assert len(keys) == 1
        memo_key, fp, _, cols = keys[0]
        assert memo_key == SF_DIR_SMALL + ":lineitem"
        assert fp is not None  # real table path -> mtime fingerprint
        assert cols == ("l_orderkey",)
    finally:
        P.reset_probe_memo()
