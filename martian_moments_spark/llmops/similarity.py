"""Similarity search over embedding columns (array<float>).

Cosine similarity is computed in FIXED POINT: each float coordinate is
converted (exactly, via the shared double widening) to integer
millionths; dot products and norms are then BIGINT sums — associative,
so identical under any partitioning, AQE re-plan, retry, or engine.
The final cosine is a double division of integers: bit-identical in
Spark and DuckDB. This is what makes an *exact* ANN oracle possible.

Scale design (100 TB):
- brute-force top-k is the baseline/verifier: O(n^2) pairs — run only
  inside a bounded candidate set.
- IVF path: a coarse quantizer assigns each vector to a cell (here the
  pre-computed ``label`` column stands in for the nearest-centroid
  assignment); search is within-cell — the self-join shuffles on the
  cell key only, turning O(n^2) into O(sum cell^2). Salting/AQE handle
  hot cells; probing multiple cells = union over cell keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

FIXED_SCALE = 1_000_000


def embedding_units(col: Column | str) -> Column:
    """array<float> → array<bigint> of exact integer millionths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * FIXED_SCALE, 0).cast("long"))




def dot_units(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)




def cosine_fixed(units_a: Column, units_b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)), all from integers.
    sqrt(na)*sqrt(nb) instead of sqrt(na*nb): the product of two
    squared norms overflows BIGINT."""
    return dot_units(units_a, units_b).cast("double") / (
        F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double"))
    )


def with_units_and_norm(
    df: DataFrame, emb_col: str = "embedding", prefix: str = ""
) -> DataFrame:
    """Precompute integer units + squared norm once per vector — the
    pairwise stage then reuses them (never recompute per pair)."""
    units = embedding_units(emb_col)
    return df.withColumn(prefix + "units", units).withColumn(
        prefix + "norm2", dot_units(F.col(prefix + "units"), F.col(prefix + "units"))
    )


def topk_cosine(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per vector.

    ``cell_col=None`` → brute force over all pairs (baseline/verifier).
    ``cell_col='label'`` → IVF: pairs only within the same cell.
    """
    base = with_units_and_norm(df.select(id_col, emb_col, *( [cell_col] if cell_col else [] )), emb_col)
    a = base.select(
        *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
        F.col(id_col).alias("id_a"),
        F.col("units").alias("units_a"),
        F.col("norm2").alias("norm_a"),
    )
    b = base.select(
        *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
        F.col(id_col).alias("id_b"),
        F.col("units").alias("units_b"),
        F.col("norm2").alias("norm_b"),
    )
    pairs = a.join(b, on="cell" if cell_col else None, how="inner") if cell_col else a.crossJoin(b)
    pairs = pairs.filter(F.col("id_a") != F.col("id_b")).withColumn(
        "cosine",
        cosine_fixed(F.col("units_a"), F.col("units_b"), F.col("norm_a"), F.col("norm_b")),
    )
    w = W.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "id_a",
            "id_b",
            "cosine",
            "rank",
            *( ["cell"] if cell_col else [] ),
        )
    )


def topk_cosine_cells_pandas(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF top-k via per-cell numpy matmul (applyInPandas).

    Same fixed-point contract as topk_cosine — coordinates become
    exact int64 millionths, the Gram matrix is an int64 matmul (exact:
    no float accumulation), cosine is a float64 division of exact
    integers — so results are bit-identical to the JVM and DuckDB
    formulations. The win is constant-factor: Spark's higher-order
    array lambdas evaluate interpreted per element, while numpy does
    the same arithmetic as one BLAS-free integer matmul per cell
    (~10x at 64-dim cells of a few hundred vectors).

    Scale shape is unchanged from topk_cosine(cell_col=...): one
    shuffle on the cell key; each cell must fit one task (IVF cell
    sizing — split hot cells upstream)."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        def half_up(v):
            # Spark's round() is half-away-from-zero; np.rint is
            # half-to-even — replicate Spark exactly.
            return np.sign(v) * np.floor(np.abs(v) + 0.5)

        u = np.stack(
            [half_up(np.asarray(e, dtype=np.float64) * FIXED_SCALE) for e in pdf[emb_col]]
        ).astype(np.int64)[order]
        g = u @ u.T  # exact int64 dot products
        norms = np.sqrt(np.diag(g).astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = g.astype(np.float64) / np.outer(norms, norms)
        np.fill_diagonal(cos, -np.inf)  # exclude self
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cosine": [], "rank": [], "cell": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64", "rank": "int32", "cell": "int32"})
        out = []
        cell = pdf[cell_col].iloc[0]
        for i in range(n):
            # sort by (-cosine, id_b): lexsort keys are last-key-primary
            idx = np.lexsort((ids, -cos[i]))[:kk + 1]
            idx = idx[idx != i][:kk]
            for rank, j in enumerate(idx, start=1):
                out.append((ids[i], ids[j], cos[i, j], rank, cell))
        return pd.DataFrame(out, columns=["id_a", "id_b", "cosine", "rank", "cell"]).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64", "rank": "int32", "cell": "int32"}
        )

    return df.select(id_col, emb_col, cell_col).groupBy(cell_col).applyInPandas(
        per_cell, "id_a BIGINT, id_b BIGINT, cosine DOUBLE, rank INT, cell INT"
    )


def topk_cosine_blocked(
    df: DataFrame,
    k: int = 5,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k, block-partitioned — the 100 TB form of
    the all-pairs search (no quantizer, unlike IVF; same answers as
    the naive cross join, so it shares that oracle).

    Vectors are dealt into ``n_blocks`` by id; every (query-block,
    candidate-block) pair is one cogroup task that computes its
    sub-matrix with an exact int64 numpy matmul and keeps a partial
    top-k per query (any global top-k candidate is within its pair's
    top-k under the same total order, so the final window re-rank over
    B*k partials is exact). Work is still O(n^2) — brute force is —
    but it is spread over B^2 independent tasks with vectorized inner
    loops and no pairwise row materialization, which is what makes the
    exact verifier runnable over a bounded candidate set at scale."""
    import numpy as np
    import pandas as pd

    b = F.lit(n_blocks)
    base = df.select(id_col, emb_col).withColumn("__blk", F.pmod(F.col(id_col), b))
    pair_ids = F.explode(F.sequence(F.lit(0), b - 1))
    queries = base.withColumn("__other", pair_ids).select(
        F.col("__blk").alias("__qb"), F.col("__other").alias("__cb"), id_col, emb_col
    )
    cands = base.withColumn("__other", pair_ids).select(
        F.col("__other").alias("__qb"), F.col("__blk").alias("__cb"), id_col, emb_col
    )

    def per_pair(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )

        def units(pdf):
            v = np.stack([np.asarray(e, dtype=np.float64) for e in pdf[emb_col]]) * FIXED_SCALE
            return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)

        qi, ci = left[id_col].to_numpy(), right[id_col].to_numpy()
        qu, cu = units(left), units(right)
        g = qu @ cu.T
        qn = np.sqrt(np.einsum("ij,ij->i", qu, qu).astype(np.float64))
        cn = np.sqrt(np.einsum("ij,ij->i", cu, cu).astype(np.float64))
        cos = g.astype(np.float64) / np.outer(qn, cn)
        out = []
        kk = min(k + 1, len(ci))  # +1: self may be present when qb == cb
        for i in range(len(qi)):
            row = cos[i]
            idx = np.lexsort((ci, -row))[:kk]
            for j in idx:
                if ci[j] != qi[i]:
                    out.append((qi[i], ci[j], row[j]))
        return pd.DataFrame(out, columns=["id_a", "id_b", "cosine"]).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )

    partial = (
        queries.groupBy("__qb", "__cb")
        .cogroup(cands.groupBy("__qb", "__cb"))
        .applyInPandas(per_pair, "id_a BIGINT, id_b BIGINT, cosine DOUBLE")
    )
    w = W.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cosine", "rank")
    )
