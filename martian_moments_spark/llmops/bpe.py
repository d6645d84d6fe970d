"""Distributed BPE vocabulary learning.

The tokenizer-training stage of an LLM data pipeline: learn the
byte-pair-encoding merge table from corpus word frequencies (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — the published algorithm every BPE tokenizer implements).
The reference has no tokenizer stage; this extends the engine's text
operators with the one pass that must see corpus-global statistics.

Spark-first shape: the state is a (word, count, syms) DataFrame; each
merge round is ONE pair-count aggregation (explode adjacent pairs,
groupBy sum — full map-side combine, so the shuffle carries one
partial count per distinct pair per task) plus a driver-side top-1
pick (a 1-row action, the argmax is corpus-global by definition) and
a JVM-side fold (`F.aggregate`) that rewrites every word's symbol
array with the merge applied. No Python UDF anywhere in the loop.

Determinism: counts are exact integers; the winning pair is
(count DESC, left ASC, right ASC) — total order, so the learned merge
table is partitioning-independent. The left-to-right greedy merge
emerges from the fold for free: once a pair merges, the combined
token replaces the window's left element and (being strictly longer)
can never equal the merge's left side again, which is exactly
non-overlapping greedy application.

Scale: rounds = merge-table size M (a constant, e.g. 32k for a real
tokenizer); each round is one bounded shuffle over the WORD table
(vocabulary-sized, not corpus-sized — the corpus is reduced to word
counts once, up front). localCheckpoint truncates the per-round
lineage; on a real cluster use reliable checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequency_table(docs: DataFrame, top_v: int, text_col: str = "text") -> DataFrame:
    """Reduce the corpus to its top-``top_v`` (word, count) rows —
    deterministic under (count DESC, word ASC) — with each word split
    into its initial character symbols. One corpus-wide count shuffle;
    everything after operates on this vocabulary-sized table."""
    from martian_moments_spark.llmops.textops import tokens

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(top_v)
    )
    syms = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return counts.select("word", "n", syms.alias("syms"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count."""
    pairs = F.when(
        F.size(F.col("syms")) >= 2,
        F.expr(
            "transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] AS left, syms[i+1] AS right))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<left:string,right:string>>)"))
    return (
        words.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").cast("long").alias("pair_count"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array with (left, right) -> left||right,
    greedy left-to-right, as a JVM fold: append each symbol unless it
    completes the pair with the accumulator's tail, in which case the
    tail is replaced by the merged token."""
    l, r = F.lit(left), F.lit(right)
    fold = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == l)
            & (s == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return words.select("word", "n", fold.alias("syms"))


def _safe_batch(rows: list, window: int, batch_limit: int) -> list:
    """Select the prefix of sorted pair rows that a BATCH merge can
    apply while remaining bit-identical to the sequential algorithm.

    Rows arrive in the sequential tie-break order (count DESC, left
    ASC, right ASC). The batch is the longest prefix whose pairs are
    pairwise symbol-disjoint (no shared left/right/merged token),
    truncated to members whose count is STRICTLY greater than the
    first excluded row's count. Why that makes batching exact:

    - a pair sharing no symbol with earlier batch members keeps its
      count unchanged when those merges apply;
    - every pair whose count can change (down), and every NEW pair a
      merge creates, descends from a pair that CONFLICTS with a batch
      member — e.g. merging (x,y)->xy turns (w,x) occurrences into
      (w,xy) ones, so count_new(w,xy) <= count_old(w,x) — and every
      conflicting pair sits at or after the first excluded row, hence
      has count <= the cutoff;
    - therefore each kept member strictly dominates every changed or
      new pair at its turn of the sequential replay, and ties among
      kept members resolve by the same (left, right) order the prefix
      already has. The sequential argmax sequence is exactly the kept
      prefix.

    A SELF-pair (left == right) closes its batch: merging (x,x) spawns
    (xx,x)-family pairs whose parent is the batch member ITSELF — the
    positional argument above cannot exclude them, and they can tie
    and tie-break-beat any LATER member (hypothesis found
    {'ca': 1, 'bbb': 1}: sequential picks (bb,b) second, a naive batch
    picks (c,a)). Members sorted BEFORE the self-pair are untouched
    (sequential reaches them first), so the self-pair simply becomes
    the last member.

    When the whole collected window is conflict-free but full (more
    pairs may exist uncollected), the last collected count is the
    conservative cutoff. The top row alone is always safe (it IS the
    sequential argmax), so progress is guaranteed."""
    batch: list = []
    used: set[str] = set()
    stop_idx = None  # first row index excluded from the batch
    for i, row in enumerate(rows):
        syms = {row["left"], row["right"], row["left"] + row["right"]}
        if (batch and (syms & used)) or len(batch) >= batch_limit:
            stop_idx = i
            break
        batch.append(row)
        used |= syms
        if row["left"] == row["right"]:
            stop_idx = i + 1  # self-pair closes the batch
            break
    # the cutoff is the best count any pair OUTSIDE the batch can hold
    # (first excluded collected row, else the uncollected tail bound);
    # the STRICT > filter then rules out every tie with a changed or
    # new pair — including the self-pair's own descendants, which only
    # threaten members that would come after it (there are none).
    cutoff = None
    if stop_idx is not None and stop_idx < len(rows):
        cutoff = rows[stop_idx]["pair_count"]
    elif len(rows) == window:  # window full → uncollected pairs may exist
        cutoff = rows[-1]["pair_count"]
    kept = [r for r in batch if cutoff is None or r["pair_count"] > cutoff]
    return kept or batch[:1]


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int,
    top_v: int = 300,
    text_col: str = "text",
    batch_limit: int = 16,
) -> list[dict]:
    """Learn ``num_merges`` BPE merges; returns the ordered merge
    table as dicts with rank / left / right / merged / pair_count.
    Stops early when no adjacent pair remains.

    Batched rounds: each round runs ONE pair-count job, collects a
    bounded window of top pairs, and applies up to ``batch_limit``
    provably-independent merges (see _safe_batch — the result is
    bit-identical to merging one pair per job). At a real 32k-merge
    vocabulary this cuts the sequential-job count by ~batch_limit x;
    ``batch_limit=1`` degenerates to the textbook one-merge-per-round
    loop."""
    words = word_frequency_table(docs, top_v, text_col).localCheckpoint(eager=True)
    merges: list[dict] = []
    window = 4 * batch_limit + 1
    while len(merges) < num_merges:
        top = (
            _pair_counts(words)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(window)
            .collect()
        )
        if not top:
            break
        kept = _safe_batch([r.asDict() for r in top], window, batch_limit)
        kept = kept[: num_merges - len(merges)]
        for row in kept:
            merges.append(
                {
                    "rank": len(merges) + 1,
                    "left": row["left"],
                    "right": row["right"],
                    "merged": row["left"] + row["right"],
                    "pair_count": row["pair_count"],
                }
            )
            # chained folds build ONE plan; a single job applies the
            # whole batch (symbol-disjoint, so order is immaterial,
            # but rank order is kept for clarity)
            words = _apply_merge(words, row["left"], row["right"])
        words = words.localCheckpoint(eager=True)
    return merges


def bpe_merge_table(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int,
    top_v: int = 300,
    text_col: str = "text",
) -> DataFrame:
    """The learned merge table as a DataFrame (the artifact a
    downstream tokenizer consumes)."""
    merges = learn_bpe_merges(spark, docs, num_merges, top_v, text_col)
    schema = "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        schema,
    )


def apply_merges_to_word(word: str, merges: list[dict]) -> list[str]:
    """Encode one word by replaying the merge table in rank order —
    the exact operation training applied, so train-time and
    encode-time segmentations agree by construction."""
    syms = list(word)
    for m in merges:
        left, right, out = m["left"], m["right"], []
        for tok in syms:
            if out and out[-1] == left and tok == right:
                out[-1] = left + right
            else:
                out.append(tok)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: per document,
    whitespace words are each segmented by replaying the merges. Runs
    as Arrow-batched mapInPandas with the merge table broadcast by
    closure (it is merge-table-sized, i.e. tiny); per-batch
    memoization collapses the heavy word repetition of natural text,
    so the per-row cost is a dict lookup for all but first
    occurrences. Deterministic: pure per-row function of (text,
    merges) — partitioning cannot change it.

    Output: (doc_id, n_subwords, subword_seq) with the sequence
    comma-joined (array columns are serialized for the engine's
    hash-compare rule)."""
    import re as _re

    import pandas as pd

    out_schema = f"{id_col} long, n_subwords long, subword_seq string"
    ws = _re.compile(r"\s+")

    def _batches(it):
        memo: dict[str, list[str]] = {}
        for pdf in it:
            ids, counts, seqs = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in ws.split(text):
                    if w == "":
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = apply_merges_to_word(w, merges)
                        memo[w] = enc
                    pieces.extend(enc)
                ids.append(doc_id)
                counts.append(len(pieces))
                seqs.append(",".join(pieces))
            yield pd.DataFrame(
                {id_col: ids, "n_subwords": counts, "subword_seq": seqs}
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, schema=out_schema)
