"""Similarity search over embedding columns (K4's scale path + ANN).

* ``cosine_topk`` — exact brute-force top-k via a crossJoin and a JVM-side
  ``aggregate(zip_with(...))`` dot product (the correctness baseline; at
  cluster scale only for small query sets against a broadcast corpus).
* ``lsh_cosine_topk`` — random-hyperplane LSH: sign-bit signatures bucket
  the corpus, candidates come from same-bucket joins (multi-probe via
  several independent tables), exact cosine re-scores candidates. The scale
  path: each table join is an equi-join on a 16-bit key.

Projection hyperplanes are generated from a seeded numpy RNG on the driver
and inlined as literal arrays (dim ≤ a few hundred) — deterministic,
no-shuffle, no UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_vec(df: DataFrame, id_out: str, vec_out: str,
              id_col: str, vec_col: str) -> DataFrame:
    vec = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        F.col(id_col).alias(id_out),
        F.transform(vec, lambda x: x / norm).alias(vec_out),
    )


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_milli) exact top-k by cosine.
    Deterministic tie-break: neighbor_id ASC on equal milli-rounded score."""
    q = _norm_vec(queries, "query_id", "q_vec", id_col, vec_col)
    c = _norm_vec(corpus, "neighbor_id", "c_vec", id_col, vec_col)
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.floor(_dot("q_vec", "c_vec") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("cos_milli"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_milli"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_milli")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec_col: str, planes: np.ndarray) -> Column:
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: same output shape as ``cosine_topk`` but neighbors
    are drawn from LSH-bucket candidates (union over n_tables independent
    sign-bit tables), exactly re-scored. Recall < 1 by design — evaluated,
    not oracle-matched."""
    q = _norm_vec(queries, "query_id", "q_vec", id_col, vec_col)
    c = _norm_vec(corpus, "neighbor_id", "c_vec", id_col, vec_col)
    # all tables' bucket keys in ONE projection per side, fanned out with
    # posexplode → a single equi-join on (table, bucket) replaces n_tables
    # separate join+union stages (and evaluates the normalization once)
    all_planes = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    qb = q.select(
        "query_id",
        F.posexplode(
            F.array(*[_bucket_col("q_vec", p) for p in all_planes])
        ).alias("tbl", "bk"),
    )
    cb = c.select(
        "neighbor_id",
        F.posexplode(
            F.array(*[_bucket_col("c_vec", p) for p in all_planes])
        ).alias("tbl2", "bk2"),
    )
    cand = qb.join(
        cb, (F.col("tbl") == F.col("tbl2")) & (F.col("bk") == F.col("bk2"))
    ).select("query_id", "neighbor_id").distinct()
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.floor(_dot("q_vec", "c_vec") * 1000 + F.lit(0.5))
            .cast("bigint")
            .alias("cos_milli"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_milli"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_milli")
    )
