"""Dense broadcast-matmul cosine scoring (the reference's "sklearn"/dense
``cosine_method`` re-expressed for Spark; ``/root/reference/polyfuzz/models/
_utils.py:94-102`` computes the same full similarity matrix in-memory).

Strategy: when the **to-side fits a broadcast** (n_to × dim doubles within a
few hundred MB), collect it once into a numpy matrix, broadcast it, and
stream the from-side through ``mapInPandas`` — each Arrow batch does ONE
BLAS matmul against the corpus matrix and emits only top-n rows above the
threshold. The from-side is unbounded (it streams); only the to-side is
capped, exactly like a broadcast-hash join. This beats the sparse term join
whenever the vocabulary is small or postings are long (hot-term fan-out
makes the term join quadratic; a 5k-doc corpus with 75 distinct trigrams
produces a 1.1-billion-row join but a 5000×75 matmul).

Scores are quantized to integer milli-units (floor(round(x,3)*1000+0.5))
INSIDE the kernel and ranked by (milli desc, to_id asc) — bit-identical to
the engine's relational top-k and to the DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = "from_id long, to_id long, sim_milli long, rnk int"


def _dense_rows(vec: DataFrame, term_ids: DataFrame) -> DataFrame:
    """(doc_id, tids: array<int>, ws: array<double>) — aligned sparse pairs,
    deterministic order via sort_array on the (tid, weight) structs."""
    pairs = (
        vec.join(F.broadcast(term_ids), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("tid", "weight"))).alias("p"))
    )
    return pairs.select(
        "doc_id",
        F.transform("p", lambda x: x["tid"]).alias("tids"),
        F.transform("p", lambda x: x["weight"]).alias("ws"),
    )


def _topk_batches(
    bc_ids, bc_mat, k: int, min_milli: int, exclude_self: bool
):
    """mapInPandas kernel: batch matmul → per-row quantized top-k."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        to_ids = bc_ids.value
        to_mat = bc_mat.value  # (n_to, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            M = np.zeros((n, to_mat.shape[1]))
            from_ids = pdf["doc_id"].to_numpy()
            for i, (tids, ws) in enumerate(zip(pdf["tids"], pdf["ws"])):
                M[i, np.asarray(tids, dtype=np.int64)] = np.asarray(ws)
            sims = M @ to_mat.T
            milli = np.floor(np.round(sims, 3) * 1000 + 0.5).astype(np.int64)
            out_f, out_t, out_s, out_r = [], [], [], []
            for i in range(n):
                row = milli[i]
                if exclude_self:
                    row = np.where(to_ids == from_ids[i], -1, row)
                ok = np.nonzero(row >= min_milli)[0]
                if not len(ok):
                    continue
                # (milli desc, to_id asc) — identical tie-break to the
                # relational window / DuckDB oracle
                order = ok[np.lexsort((to_ids[ok], -row[ok]))][:k]
                out_f.extend([from_ids[i]] * len(order))
                out_t.extend(to_ids[order])
                out_s.extend(row[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"from_id": out_f, "to_id": out_t, "sim_milli": out_s,
                 "rnk": out_r}
            )

    return gen


def tfidf_dense_topk(
    from_vec: DataFrame,
    to_vec: DataFrame,
    top_n: int = 1,
    min_similarity: float = 0.0,
    exclude_self: bool = False,
) -> DataFrame:
    """(from_id, to_id, sim_milli, rnk) — exact TF-IDF cosine top-n via
    broadcast matmul. ``to_vec`` must be broadcast-sized (n_to × |vocab|
    doubles); ``from_vec`` streams. Inputs are (doc_id, term, weight)
    L2-normalized sparse vectors (operators/tfidf.vectorize output)."""
    spark = from_vec.sparkSession
    # |vocab| is small by precondition → single-partition window is fine
    term_ids = (
        to_vec.select("term")
        .union(from_vec.select("term"))
        .distinct()
        .withColumn(
            "tid", F.row_number().over(Window.orderBy("term")) - 1
        )
    )
    to_rows = _dense_rows(to_vec, term_ids).collect()
    dim = term_ids.count()
    n_to = len(to_rows)
    to_ids = np.array([r["doc_id"] for r in to_rows], dtype=np.int64)
    to_mat = np.zeros((n_to, dim))
    for i, r in enumerate(to_rows):
        to_mat[i, np.asarray(r["tids"], dtype=np.int64)] = np.asarray(r["ws"])
    sc = spark.sparkContext
    bc_ids, bc_mat = sc.broadcast(to_ids), sc.broadcast(to_mat)
    min_milli = int(np.floor(round(min_similarity, 3) * 1000 + 0.5)) if (
        min_similarity > 0
    ) else 0
    return _dense_rows(from_vec, term_ids).mapInPandas(
        _topk_batches(bc_ids, bc_mat, top_n, min_milli, exclude_self),
        schema=OUT_SCHEMA,
    )


def tfidf_dense_topk_packed(
    packed: DataFrame,
    dim: int,
    top_n: int = 1,
    min_similarity: float = 0.0,
    exclude_self: bool = False,
) -> DataFrame:
    """Self-match dense top-n over PACKED vectors (doc_id, t: array<int>
    dense vocab ids, w: array<float>) — the mapside-vectorizer output.
    Same kernel and output contract as ``tfidf_dense_topk`` without the
    relational term-row detour (one collect builds the corpus matrix)."""
    spark = packed.sparkSession
    rows = packed.collect()
    to_ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    to_mat = np.zeros((len(rows), dim))
    for i, r in enumerate(rows):
        to_mat[i, np.asarray(r["t"], dtype=np.int64)] = np.asarray(
            r["w"], dtype=np.float64
        )
    sc = spark.sparkContext
    bc_ids, bc_mat = sc.broadcast(to_ids), sc.broadcast(to_mat)
    min_milli = int(np.floor(round(min_similarity, 3) * 1000 + 0.5)) if (
        min_similarity > 0
    ) else 0
    renamed = packed.select(
        "doc_id", F.col("t").alias("tids"), F.col("w").alias("ws")
    )
    return renamed.mapInPandas(
        _topk_batches(bc_ids, bc_mat, top_n, min_milli, exclude_self),
        schema=OUT_SCHEMA,
    )


def embedding_dense_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_milli) — exact embedding cosine
    top-k, corpus broadcast as one L2-normalized matrix, queries streamed
    through a batch matmul (replaces an n_q × n_c crossJoin)."""
    spark = queries.sparkSession

    def normed(df: DataFrame) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        nrm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.transform(vec, lambda x: x / nrm).alias("v"),
        )

    c_rows = normed(corpus).collect()
    to_ids = np.array([r["doc_id"] for r in c_rows], dtype=np.int64)
    to_mat = np.array([r["v"] for r in c_rows])
    sc = spark.sparkContext
    bc_ids, bc_mat = sc.broadcast(to_ids), sc.broadcast(to_mat)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_np = bc_ids.value
        mat = bc_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf["doc_id"].to_numpy()
            Q = np.array([np.asarray(v) for v in pdf["v"]])
            milli = np.floor(Q @ mat.T * 1000 + 0.5).astype(np.int64)
            out = {"query_id": [], "neighbor_id": [], "rank": [],
                   "cos_milli": []}
            for i in range(len(pdf)):
                row = milli[i]
                if exclude_self:
                    # sentinel below any real milli-cosine (≥ -1000); NOT
                    # int64.min, whose negation overflows in the sort key
                    row = np.where(ids_np == q_ids[i], -(10 ** 9), row)
                keep = np.nonzero(row > -(10 ** 9))[0]
                order = keep[np.lexsort((ids_np[keep], -row[keep]))][:k]
                out["query_id"].extend([q_ids[i]] * len(order))
                out["neighbor_id"].extend(ids_np[order])
                out["rank"].extend(range(1, len(order) + 1))
                out["cos_milli"].extend(row[order])
            yield pd.DataFrame(out)

    return normed(queries).mapInPandas(
        gen, schema="query_id long, neighbor_id long, rank int, cos_milli long"
    )
