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


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int,
    top_v: int = 300,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``num_merges`` BPE merges; returns the ordered merge
    table as dicts with rank / left / right / merged / pair_count.
    Stops early when no adjacent pair remains."""
    words = word_frequency_table(docs, top_v, text_col).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append(
            {
                "rank": rank,
                "left": row["left"],
                "right": row["right"],
                "merged": row["left"] + row["right"],
                "pair_count": row["pair_count"],
            }
        )
        words = _apply_merge(words, row["left"], row["right"]).localCheckpoint(
            eager=True
        )
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
