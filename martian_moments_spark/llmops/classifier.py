"""Trained quality classifier over hashed n-gram features — the
FineWeb-Edu / fastText-style learned filter (Joulin et al. 2017;
Penedo et al. 2024) re-expressed in the engine's exact integer
arithmetic so the DuckDB oracle replays the ENTIRE training run and
hash-matches the scores.

This completes the quality tier triad real curation pipelines run
(CCNet → FineWeb lineage): heuristic gate (llmops/lm.py lm_gate) →
LM perplexity filter (llmops/lm.py bigram_lm_scores) → LEARNED
classifier, trained on the two earlier tiers' agreement.

Model: a linear classifier over hashed bag-of-bigram counts — the
fastText architecture (a linear map over averaged hashed-ngram
features; the decision boundary of the n=1 hidden layer is the same
linear form). Training is the hinge-loss subgradient rule with unit
step — the perceptron — rather than logistic regression: a logistic
gradient needs sigmoid/exp, and libm exp differs across engines in
the last ulp, which would break the value-hash gate (the same reason
llmops/lm.py sums integer rationals instead of log-probs). Every
update is int64 addition, so the trained weight vector is
bit-identical in numpy and in the DuckDB recursive-CTE replay.

Seed labels — the weak-supervision agreement rule (the standard
bootstrap when no human labels exist; FineWeb-Edu seeds from an LLM
judge, CCNet from a reference corpus — here the two in-engine tiers):

    +1  heuristic gate passes AND the LM filter keeps
    -1  heuristic gate fails  AND the LM filter rejects
     0  the tiers disagree — excluded from training

Training sample: the ``CLS_SAMPLE`` labeled, featureful documents
with the smallest ``(portable_hash31('cls:' || doc_id), doc_id)`` —
the same bounded deterministic-sample pattern as the k-means
quantizer (llmops/similarity.kmeans_units), so both engines select
the identical set in the identical order with no data-dependent
driver state. ``CLS_EPOCHS`` passes over that order; at step t the
sample ``t mod n`` is visited (plain SGD order, no shuffling — the
order is already hash-randomized).

Scoring: score = w . x + b over the corpus — one bigram explode, one
BROADCAST join against the CLS_BUCKETS-row weight table, one
map-side-combinable groupBy(doc_id). Identical 100 TB shape to
llmops/dsir.py: no shuffle keyed wider than doc_id, the model is
metadata-sized at any corpus scale. keep = score > 0, an integer
comparison — no float anywhere in the verdict path.

Overflow bound (documented like lm.py/dsir.py): every weight obeys
|w_i| <= total updates * max bucket count <= CLS_EPOCHS * CLS_SAMPLE
* c_max, and a score sums n_f of those times c_max; int64 holds while
CLS_EPOCHS * CLS_SAMPLE * c_max^2 * n_f < 2^63 — for 2^20-feature
documents and c_max under 2^10 that allows ~2^21 training steps,
far above the 768 configured. No renormalization is ever needed at
the configured operating point.

Sharp invariants (property-tested in tests/test_properties.py):
  * exact replay: the numpy-trained (w, b) equals a pure-Python
    reference fold on any sample, any seed;
  * perceptron convergence: on a corpus whose positive and negative
    classes touch disjoint hash buckets (linearly separable with
    margin), training to convergence classifies every training
    document correctly, so planted gibberish scores <= 0 < quality
    scores.

Reference parity anchor: the reference repo has no learned-filter
tier — this is an extension operator of the LLM-curation family
(VERDICT r08 Next-round #3), same exactness contract as the rest of
llmops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from martian_moments_spark.llmops.lm import (
    bigram_lm_scores,
    lm_gate,
    sql_bigram_lm_ctes,
    sql_lm_gate,
)
from martian_moments_spark.llmops.textops import (
    portable_hash31,
    sql_portable_hash31,
    tokens,
)

#: hash-bucket domain of the feature space — bounds the weight vector
#: (and the broadcast scoring table) at this many rows at any corpus
#: scale. Matches llmops/dsir.py's operating point; a dial, not a
#: mechanism (fastText defaults to 2M buckets).
CLS_BUCKETS = 512

#: training-sample bound: documents collected to the driver for the
#: in-memory gradient loop. The kmeans_units pattern — bounded,
#: deterministic, order-free.
CLS_SAMPLE = 256

#: SGD epochs over the sample. 3 * 256 = 768 integer update steps —
#: the DuckDB oracle unrolls the same count in its recursive CTE.
CLS_EPOCHS = 3

_BG = "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"
_SQL_BG = "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])"


def train_perceptron(X, y, epochs: int = CLS_EPOCHS):
    """Integer perceptron: given int64 feature matrix ``X`` (n, B) and
    labels ``y`` in {+1, -1}, run ``epochs`` sequential passes in row
    order; on each misclassified (or boundary) sample add y*x to the
    weights and y to the bias. Returns ``(w, b, n_updates)`` — all
    int64, bit-identical to the DuckDB recursive-CTE fold. Empty input
    returns the zero model (scores then reduce to b = 0, keep false
    everywhere — the degenerate-corpus contract)."""
    import numpy as np

    X = np.asarray(X, dtype=np.int64)
    n = len(X)
    B = X.shape[1] if n else CLS_BUCKETS
    w = np.zeros(B, dtype=np.int64)
    b = np.int64(0)
    updates = 0
    for _ in range(epochs):
        for i in range(n):
            yi = int(y[i])
            if yi * (int(w @ X[i]) + int(b)) <= 0:
                w += yi * X[i]
                b += yi
                updates += 1
    return w, int(b), updates


def _doc_bucket_rows(toks: DataFrame) -> DataFrame:
    """(doc_id, bucket): one row per document bigram, hashed into the
    CLS_BUCKETS feature domain. The size >= 2 guard mirrors
    lm._doc_bigrams (sequence(0, -1) runs DESCENDING and would
    fabricate bigrams for 1-token docs)."""
    bgs = F.when(F.size("t") >= 2, F.expr(_BG)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )
    return toks.select("doc_id", F.explode(bgs).alias("bg")).select(
        "doc_id", (portable_hash31(F.col("bg")) % CLS_BUCKETS).alias("bucket")
    )


def classifier_scores(
    docs: DataFrame, epochs: int = CLS_EPOCHS, with_tiers: bool = False
) -> DataFrame:
    """Score every document of (doc_id, text) with the trained linear
    quality classifier. One row per input document: (doc_id,
    seed_label, n_features, score, keep). Documents with fewer than 2
    tokens have no features: NULL score, keep = false (mirrors the LM
    tier's verdict for featureless documents). ``seed_label`` is the
    agreement label (+1/-1/0) so downstream reports can audit the
    classifier against its own supervision.

    ``with_tiers=True`` additionally emits the two supervising
    verdicts (``gate_pass``, ``lm_keep``) — they are computed here
    anyway to build the seed labels, and re-deriving them outside
    means a second full run of the bigram-LM pipeline (the
    quality_tier_agreement case, measured 1.3x on the r11 A/B).

    Jobs: ONE bounded driver collect (the <= CLS_SAMPLE x CLS_BUCKETS
    sparse sample-feature rows — the kmeans_units collect pattern);
    training is a numpy loop over that sample; scoring is a broadcast
    join + map-side-combined doc aggregate over the corpus.

    ``labeled`` and ``counts`` are eager localCheckpoints: the sample
    collect is an ACTION that computes both in full (the 256-id join
    cannot prune the per-doc aggregates), and without the barrier the
    returned plan recomputes them — the seed labels re-run the entire
    bigram-LM pipeline and the features re-run the corpus bigram
    explode, a second full corpus pass each (measured 1.9x on the
    r11 interleaved A/B). What is persisted is narrow metadata, never
    text: (doc_id, int) labels and the (doc_id, bucket, cnt) sparse
    matrix bounded at CLS_BUCKETS rows per document. On a cluster use
    reliable checkpointing — the connected_components note.
    """
    import numpy as np

    spark = docs.sparkSession
    toks = docs.select("doc_id", tokens("text").alias("t"))
    labeled = (
        toks.select("doc_id", lm_gate(F.col("t")).alias("gate"))
        .join(bigram_lm_scores(docs).select("doc_id", "keep"), "doc_id")
        .select(
            "doc_id",
            F.when(F.col("gate") & F.col("keep"), 1)
            .when(~F.col("gate") & ~F.col("keep"), -1)
            .otherwise(0)
            .cast("int")
            .alias("seed_label"),
            F.col("gate").alias("gate_pass"),
            F.col("keep").alias("lm_keep"),
        )
        .localCheckpoint(eager=True)
    )
    counts = (
        _doc_bucket_rows(toks)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )

    # Bounded deterministic training sample: labeled AND featureful,
    # smallest (hash, doc_id). The collect is <= CLS_SAMPLE docs of
    # <= CLS_BUCKETS sparse entries each.
    sample_ids = (
        labeled.filter(F.col("seed_label") != 0)
        .join(counts.select("doc_id").distinct(), "doc_id")
        .withColumn(
            "__h",
            portable_hash31(F.concat(F.lit("cls:"), F.col("doc_id").cast("string"))),
        )
        .orderBy("__h", "doc_id")
        .limit(CLS_SAMPLE)
        .select("doc_id", "seed_label", "__h")
    )
    rows = (
        sample_ids.join(counts, "doc_id")
        .select("__h", "doc_id", "seed_label", "bucket", "cnt")
        .collect()
    )
    order: dict = {}
    for r in rows:
        key = (r["__h"], r["doc_id"])
        order.setdefault(key, (r["seed_label"], []))[1].append(
            (r["bucket"], r["cnt"])
        )
    keys = sorted(order)
    X = np.zeros((len(keys), CLS_BUCKETS), dtype=np.int64)
    y = np.zeros(len(keys), dtype=np.int64)
    for i, key in enumerate(keys):
        lbl, pairs = order[key]
        y[i] = lbl
        for bkt, cnt in pairs:
            X[i, bkt] = cnt
    w, b, _ = train_perceptron(X, y, epochs)

    wdf = spark.createDataFrame(
        [(i, int(w[i])) for i in range(CLS_BUCKETS)], "bucket INT, wt BIGINT"
    )
    # Score from the checkpointed sparse counts, not a re-explode of
    # the corpus: sum(cnt) is exactly the old per-bigram-row count and
    # sum(cnt*wt) exactly the old per-row weight sum (all int64; the
    # module overflow bound already covers cnt*wt — it IS the score
    # contribution of one bucket).
    scored = (
        counts.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.sum(F.col("cnt") * F.col("wt")).cast("long").alias("dot"),
        )
    )
    has_f = F.col("n_features").isNotNull()
    return (
        labeled.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "seed_label",
            F.coalesce("n_features", F.lit(0).cast("long")).alias("n_features"),
            F.when(has_f, (F.col("dot") + F.lit(b)).cast("long")).alias("score"),
            F.coalesce(
                F.when(has_f, F.col("dot") + F.lit(b) > 0), F.lit(False)
            ).alias("keep"),
            *(["gate_pass", "lm_keep"] if with_tiers else []),
        )
    )


def sql_classifier_ctes(epochs: int = CLS_EPOCHS) -> str:
    """DuckDB CTE chain mirroring classifier_scores exactly — INCLUDING
    the training run, replayed as a recursive-CTE fold over the same
    deterministic sample in the same order with the same integer
    updates — ending in ``cls`` (one row per document, same columns).
    Composable under ``WITH RECURSIVE``: queries append their own
    SELECT. Requires ``{sql_bigram_lm_ctes()}`` to precede it (the
    seed labels read the ``toks`` and ``lm`` CTEs)."""
    bucket = f"{sql_portable_hash31('bg')} % {CLS_BUCKETS}"
    samp_h = sql_portable_hash31("'cls:' || CAST(doc_id AS VARCHAR)")
    # aliased twin built directly (ADVICE r09): post-hoc .replace on the
    # expansion would silently rewrite any other 'doc_id' occurrence if
    # sql_portable_hash31 ever grows one. Byte-identical to the old
    # replace output today, so attested oracle hashes are unchanged.
    samp_h_lb = sql_portable_hash31("'cls:' || CAST(lb.doc_id AS VARCHAR)")
    return f"""
        labeled AS (
            SELECT t.doc_id,
                   CASE WHEN ({sql_lm_gate("t.t")}) AND l.keep THEN 1
                        WHEN NOT ({sql_lm_gate("t.t")}) AND NOT l.keep THEN -1
                        ELSE 0 END AS seed_label
            FROM toks t JOIN lm l USING (doc_id)
        ),
        cls_feats AS (
            SELECT doc_id, {bucket} AS bucket
            FROM (SELECT doc_id, UNNEST({_SQL_BG}) AS bg FROM toks)
        ),
        cls_counts AS (
            SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM cls_feats GROUP BY doc_id, bucket
        ),
        cls_sample AS (
            SELECT doc_id, seed_label,
                   ROW_NUMBER() OVER (ORDER BY {samp_h}, doc_id) - 1 AS i
            FROM (
                SELECT lb.doc_id, lb.seed_label
                FROM labeled lb
                WHERE lb.seed_label <> 0
                  AND EXISTS (SELECT 1 FROM cls_counts c
                              WHERE c.doc_id = lb.doc_id)
                ORDER BY {samp_h_lb}, lb.doc_id
                LIMIT {CLS_SAMPLE}
            )
        ),
        cls_dense AS MATERIALIZED (
            -- MATERIALIZED is load-bearing: DuckDB inlines plain CTEs,
            -- so the recursive term below would otherwise re-evaluate
            -- the whole upstream chain (lm model + dense build) once
            -- PER TRAINING STEP — measured 126 s vs 2 s at sf0.001.
            SELECT s.i, s.seed_label AS y,
                   COUNT(*) OVER () AS ns,
                   list(COALESCE(c.cnt, 0) ORDER BY g.range) AS x
            FROM cls_sample s
            CROSS JOIN range(0, {CLS_BUCKETS}) g
            LEFT JOIN cls_counts c
                   ON c.doc_id = s.doc_id AND c.bucket = g.range
            GROUP BY s.i, s.seed_label
        ),
        cls_train(t, w, b) AS (
            SELECT 0,
                   list_transform(range(0, {CLS_BUCKETS}),
                                  i -> CAST(0 AS BIGINT)),
                   CAST(0 AS BIGINT)
            UNION ALL
            SELECT cls_train.t + 1,
                   CASE WHEN s.y * (list_sum(list_transform(
                                list_zip(cls_train.w, s.x),
                                z -> z[1] * z[2])) + cls_train.b) <= 0
                        THEN list_transform(list_zip(cls_train.w, s.x),
                                            z -> z[1] + s.y * z[2])
                        ELSE cls_train.w END,
                   CASE WHEN s.y * (list_sum(list_transform(
                                list_zip(cls_train.w, s.x),
                                z -> z[1] * z[2])) + cls_train.b) <= 0
                        THEN cls_train.b + s.y
                        ELSE cls_train.b END
            FROM cls_train
            JOIN cls_dense s ON s.i = cls_train.t % s.ns
            WHERE cls_train.t < {epochs} * s.ns
        ),
        cls_model AS (
            SELECT w, b FROM cls_train ORDER BY t DESC LIMIT 1
        ),
        cls_wt AS (
            SELECT generate_subscripts(w, 1) - 1 AS bucket,
                   UNNEST(w) AS wt
            FROM cls_model
        ),
        cls_scored AS (
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_features,
                   CAST(SUM(wt.wt) AS BIGINT) AS dot
            FROM cls_feats f JOIN cls_wt wt USING (bucket)
            GROUP BY f.doc_id
        ),
        cls AS (
            SELECT lb.doc_id,
                   CAST(lb.seed_label AS INT) AS seed_label,
                   CAST(COALESCE(s.n_features, 0) AS BIGINT) AS n_features,
                   CASE WHEN s.n_features > 0
                        THEN CAST(s.dot + m.b AS BIGINT)
                        ELSE NULL END AS score,
                   CASE WHEN s.n_features > 0
                        THEN s.dot + m.b > 0
                        ELSE FALSE END AS keep
            FROM labeled lb
            LEFT JOIN cls_scored s USING (doc_id)
            CROSS JOIN cls_model m
        )
    """
