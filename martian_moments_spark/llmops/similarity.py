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


def sql_embedding_units(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {FIXED_SCALE}, 0) AS BIGINT))"


def dot_units(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_dot_units(a: str, b: str) -> str:
    return f"CAST(list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2])) AS BIGINT)"


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
