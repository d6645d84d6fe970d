"""Product quantization (IVF-PQ's compression half) over fixed-point
embedding units.

PQ is the standard way to hold a 100 TB vector corpus in searchable
memory: split each D-dim vector into M subspaces, k-means each
subspace to K codes, store the M byte-sized codes instead of the D
floats (here 64 dims * 8 bytes -> 16 codes: ~32x smaller), and answer
queries with asymmetric distance computation (ADC) — a per-query
lookup table of exact subspace distances summed over the stored codes.

Everything is integer or IEEE-exact, mirroring ``kmeans_units``
(similarity.py:200): training reads the same deterministic hash-ordered
sample, per-subspace seeds are the first K sample rows, assignment is
exact int64 squared L2 with ties to the lowest code, centroid updates
are ``floor(sum/count + 0.5)``. The whole pipeline — training,
encoding, ADC search — therefore replays exactly in ANSI SQL
(``sql_pq_ctes``), giving the PQ path a hash-exact DuckDB oracle,
which ANN implementations almost never have.

Scale design: training is numpy on a bounded driver sample (one Spark
job); encoding is one ``mapInPandas`` streaming pass with the M*K
integer codebooks as a tiny closure (no shuffle); ADC search is a
broadcast join of the per-query LUT (M*K rows per query) against the
exploded code column — a linear scan of the compressed corpus, the
same memory-bandwidth-bound shape FAISS runs, never a crossJoin of
raw vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from martian_moments_spark.llmops.similarity import with_units_and_norm
from martian_moments_spark.llmops.textops import portable_hash31

PQ_M = 16  # subspaces (FAISS-style PQ16: 64 dims -> 4-dim subspaces)
PQ_K = 64  # codes per subspace (6 bits; 96 bits/vector, ~32x smaller)
PQ_ITERS = 2  # k-means refinement rounds per subspace
PQ_SAMPLE = 4096  # driver-side training sample cap


def pq_train_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    sample: int = PQ_SAMPLE,
):
    """Train per-subspace codebooks on the deterministic sample.

    Returns ``(base_df, codebooks)`` where ``base_df`` has
    ``(id_col, units, norm2)`` and ``codebooks[s]`` is the sorted
    ``[(code_id, np.int64[subdim])]`` list for subspace ``s``. Same
    determinism contract as ``kmeans_units``: bit-reproducible on any
    engine, replayed by ``sql_pq_ctes``."""
    import numpy as np

    base = with_units_and_norm(df.select(id_col, emb_col), emb_col).select(
        id_col, "units", "norm2"
    )
    train_rows = (
        base.withColumn("__h", portable_hash31(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(sample)
        .select("units")
        .collect()
    )
    T_full = np.stack([np.asarray(r[0], dtype=np.int64) for r in train_rows])
    dim = T_full.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    codebooks = []
    for s in range(m):
        T = T_full[:, s * sub : (s + 1) * sub]
        cents = [(i, T[i].copy()) for i in range(min(k, len(T)))]
        for _ in range(iters):
            code_ids = np.array([c for c, _ in cents], dtype=np.int64)
            C = np.stack([v for _, v in cents])
            d = ((T[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = code_ids[d.argmin(axis=1)]
            new_cents = []
            for cid in code_ids:
                members = T[a == cid]
                if len(members):
                    new_cents.append(
                        (
                            int(cid),
                            np.floor(
                                members.sum(axis=0) / len(members) + 0.5
                            ).astype(np.int64),
                        )
                    )
            cents = new_cents
        codebooks.append(cents)
    return base, codebooks


def pq_encode(base: DataFrame, codebooks, id_col: str = "vec_id") -> DataFrame:
    """Encode the whole corpus: one vectorized streaming pass adding a
    ``codes ARRAY<INT>`` column (subspace -> nearest code id, exact
    int64 distances, ties to the lowest code). No shuffle."""
    import numpy as np

    mats = []  # (code_ids, C) per subspace
    for cents in codebooks:
        mats.append(
            (
                np.array([c for c, _ in cents], dtype=np.int64),
                np.stack([v for _, v in cents]),
            )
        )
    m = len(mats)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(codes=pd.Series([], dtype=object))
                continue
            U = np.stack([np.asarray(u, dtype=np.int64) for u in pdf["units"]])
            sub = U.shape[1] // m
            codes = np.empty((len(U), m), dtype=np.int32)
            for s, (code_ids, C) in enumerate(mats):
                S = U[:, s * sub : (s + 1) * sub]
                d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = code_ids[d.argmin(axis=1)]
            yield pdf.assign(codes=list(codes))

    schema = f"{id_col} BIGINT, units ARRAY<BIGINT>, norm2 BIGINT, codes ARRAY<INT>"
    return base.mapInPandas(fn, schema)


def codebook_df(spark: SparkSession, codebooks) -> DataFrame:
    """The codebooks as a tiny (m, code, centroid) DataFrame — M*K
    rows, always broadcast."""
    rows = [
        (s, int(cid), [int(x) for x in vec])
        for s, cents in enumerate(codebooks)
        for cid, vec in cents
    ]
    return spark.createDataFrame(rows, "m INT, code INT, centroid ARRAY<BIGINT>")


def subspace_sqdist(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 between two BIGINT arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sql_pq_ctes(
    units_sql: str,
    hash_sql: str,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    table: str = "embeddings",
    id_col: str = "vec_id",
    sample: int = PQ_SAMPLE,
) -> str:
    """DuckDB CTE chain replaying PQ training + encoding exactly.

    Ends with ``penc(vec_id, units, m, code)`` — one row per (vector,
    subspace) — and ``pcents(m, code, c)``. Callers build the ADC
    search on top. Mirrors ``sql_kmeans_ctes`` mechanics per subspace
    (same sample, seeds, distances, tie-breaks, rounding)."""
    sub = dim // m
    parts = [
        f"""ptrain AS (
            SELECT {id_col} AS vec_id, {units_sql} AS units
            FROM {table}
            ORDER BY {hash_sql}, {id_col} LIMIT {sample}
        ), punits AS (
            SELECT {id_col} AS vec_id, {units_sql} AS units FROM {table}
        )"""
    ]
    cents_names = []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub  # 1-based inclusive slice
        sl = f"(units)[{lo}:{hi}]"
        # seeds = the first k rows of the hash-ordered sample; CTE row
        # order is not guaranteed after materialization, so the seed
        # subquery re-derives that order and ROW_NUMBER follows it
        # (hash_sql recomputes from the aliased vec_id column).
        parts.append(
            f"""p{s}_cents_0 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY {hash_sql}, vec_id) - 1 AS code,
                   {sl} AS c
            FROM (SELECT {id_col} AS vec_id, {units_sql} AS units
                  FROM {table} ORDER BY {hash_sql}, {id_col} LIMIT {k})
        )"""
        )
        prev = f"p{s}_cents_0"
        for t in range(1, iters + 1):
            parts.append(
                f"""p{s}_dist_{t} AS (
                SELECT v.vec_id, {sl.replace('units', 'v.units')} AS su, c.code,
                       CAST(list_sum(list_transform(
                            list_zip({sl.replace('units', 'v.units')}, c.c),
                            z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS d
                FROM ptrain v CROSS JOIN {prev} c
            ), p{s}_assign_{t} AS (
                SELECT vec_id, su, code FROM (
                    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn
                    FROM p{s}_dist_{t}
                ) WHERE rn = 1
            ), p{s}_coord_{t} AS (
                SELECT code, pos,
                       CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS coord
                FROM (
                    SELECT code, unnest(range(1, len(su) + 1)) AS pos,
                           unnest(su) AS val
                    FROM p{s}_assign_{t}
                ) GROUP BY code, pos
            ), p{s}_cents_{t} AS (
                SELECT code, list(coord ORDER BY pos) AS c
                FROM p{s}_coord_{t} GROUP BY code
            )"""
            )
            prev = f"p{s}_cents_{t}"
        parts.append(
            f"""p{s}_enc AS (
            SELECT vec_id, units, {s} AS m, code FROM (
                SELECT v.vec_id, v.units, c.code,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                           CAST(list_sum(list_transform(
                                list_zip({sl.replace('units', 'v.units')}, c.c),
                                z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT), c.code) AS rn
                FROM punits v CROSS JOIN {prev} c
            ) WHERE rn = 1
        )"""
        )
        cents_names.append((s, prev))
    parts.append(
        "penc AS ("
        + " UNION ALL ".join(f"SELECT * FROM p{s}_enc" for s in range(m))
        + ")"
    )
    parts.append(
        "pcents AS ("
        + " UNION ALL ".join(
            f"SELECT {s} AS m, code, c FROM {name}" for s, name in cents_names
        )
        + ")"
    )
    return ", ".join(parts)
