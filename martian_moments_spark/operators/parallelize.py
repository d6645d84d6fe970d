"""Scan-parallelism repair for fan-out stages (optimization guide
§2.4 "remove shuffles outright" has a dual: ADD the one cheap shuffle
that unserializes a stage).

Spark sizes scan partitions by INPUT bytes (``maxPartitionBytes`` /
``openCostInBytes``), which is right when downstream per-byte cost is
O(1). A fan-out stage — an explode of O(len^2) signature variants, an
Arrow-batched decode, a per-row neighborhood expansion — multiplies
each input byte by orders of magnitude, so a kilobyte-scale scan (one
split, one task) serializes the whole stage's CPU on a single core
while the rest of the cluster idles. Measured on the FastSS signature
stage at sf0.1: 3.7 s serial vs 1.0 s after hash-repartitioning onto
the session's cores (r11 profile, stage `edit_distance_*` #1).

``spread_fanout`` hash-repartitions the (narrow — call it BEFORE the
fan-out, while rows are still small) input onto the session's default
parallelism when, and only when, the input's own partition count is
below it. At real scale a corpus scan already has more splits than
cores, so the call is the identity and no extra shuffle is paid where
the scan itself provides the parallelism — the knob is scale-adaptive
by construction, not tuned to local core counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_fanout(df: DataFrame, key_col: str, *more_cols: str) -> DataFrame:
    """Ensure ``df`` is spread over the session's parallelism before a
    high-amplification (explode / Arrow-UDF) stage.

    - Partitioning key is a real column (deterministic under task
      retry — guide §2.5 forbids rand()-derived keys), so re-run map
      tasks reproduce the same row placement.
    - The partition count is passed EXPLICITLY: a bare
      ``repartition(col)`` is AQE-coalescible, and AQE would fold a
      kilobyte-scale shuffle straight back into one task, undoing the
      repair. REPARTITION_BY_NUM is exempt from coalescing.
    - Identity when the input already has >= defaultParallelism
      partitions (the at-scale case), so this never ADDS a shuffle of
      a large input.

    Call it on a scan-shaped input (scan + filter + narrow project):
    ``df.rdd.getNumPartitions()`` builds the physical plan to count
    partitions, which is cheap there and would not be on a plan that
    already contains joins.

    Pass extra columns when the single natural key is too low-
    cardinality to spread evenly (guide §2.5: use far more distinct
    key values than partitions); the hash covers the tuple.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in (key_col, *more_cols)])


#: scan-narrowness memo: (memo_key, target) -> bool. Same contract as
#: llmops.textops.scan_is_narrow but keyed here so relational plan
#: builders don't pay a physical-planning probe per query build — the
#: split count of a table's scan depends only on its files, never on
#: the projection/filter above it, so one probe per (dataset, session
#: parallelism) serves every query over that table.
_NARROW_MEMO: dict = {}


def spread_scan(
    df: DataFrame, memo_key: str, key_col: str, *more_cols: str
) -> DataFrame:
    """spread_fanout for FACT-TABLE scans, with the narrowness probe
    memoized per dataset (``memo_key`` = sf_dir + table name).

    Motivation (r11 profile): at bench scale a single-row-group
    parquet file yields ONE effective scan task, so scan-side work —
    expression evaluation, partial aggregation, broadcast-join
    probing — serializes on one core while 31 idle. Repartitioning
    the narrow post-scan projection onto the session's parallelism
    unserializes all of it for the cost of one small shuffle. At real
    scale the scan carries >= cores splits and this is the identity —
    same scale-adaptive contract as spread_fanout.

    Pick ``key_col`` (+ ``more_cols``) as the FIRST downstream
    shuffle key where one exists: ``repartition(N, key)`` establishes
    hashpartitioning(key, N), which a following groupBy/join on the
    same key reuses (guide §2.4 "two operations keyed the same way
    can share one exchange"), so the spread replaces — not adds — an
    exchange in those plans.

    Session conf ``martian.parallelize.spreadScan`` (``always`` /
    ``never`` / default ``auto``) pins the decision for cluster
    operators, mirroring ``martian.textops.anchorSpread``.
    """
    spark = df.sparkSession
    mode = spark.conf.get("martian.parallelize.spreadScan", "auto")
    if mode == "never":
        return df
    target = spark.sparkContext.defaultParallelism
    if mode != "always":
        key = (memo_key, target)
        narrow = _NARROW_MEMO.get(key)
        if narrow is None:
            narrow = df.rdd.getNumPartitions() < target
            _NARROW_MEMO[key] = narrow
        if not narrow:
            return df
    return df.repartition(target, *[F.col(c) for c in (key_col, *more_cols)])


# An r11 draft also carried ``repartition_for_key`` (pre-materialize
# the exchange that keyed consumers would insert, hoping ReuseExchange
# collapses sibling subtrees). Measured and REMOVED: column pruning
# gives sibling consumers different projections below the exchange, so
# the subtrees never canonicalize equal and nothing is reused — and
# when the consumer is a broadcast join the keyed exchange serves no
# one at all (cross_doc_ngram_spans benched 1.80 s with it vs 1.20 s
# without, same session, interleaved). Exchange sharing that actually
# fires comes from IDENTICAL subtrees (this module's spread_fanout
# qualifies: both consumers read the same spread shuffle files).
