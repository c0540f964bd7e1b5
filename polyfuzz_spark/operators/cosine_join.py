"""Sparse cosine similarity as a relational term-join (operators J1/J2/J3).

Reference computes an all-pairs (sparse or dense) cosine matrix
(``/root/reference/polyfuzz/models/_utils.py:59-102``). In Spark the exact
same result is a **join, not a matrix**: two L2-normalized sparse vectors
have cosine = Σ_{shared terms} w_from · w_to, so

    from_vec ⋈_term to_vec  →  groupBy(from_id, to_id) Σ(w·w)

Pairs with zero shared terms never materialize (that's the sparsity), the
aggregation is map-side combinable, and the whole plan stays in
whole-stage codegen — no UDF anywhere.

Scale note: common terms (e.g. license-header trigrams at code scale) make
this join quadratic on hot keys. Above a size switch the pipeline swaps to
blocked candidate generation (operators/blocking.py: MinHash bands → salted
equi-join) and scores only candidates via ``cosine_for_candidates``.
``max_df`` offers an additional guard: terms present in more than that
fraction of documents contribute negligible IDF weight but dominate join
fan-out, so the candidate-generation join may drop them (exact scoring then
re-adds them via cosine_for_candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sparse_cosine_pairs(
    from_vec: DataFrame,
    to_vec: DataFrame,
    exclude_self: bool = False,
    min_similarity: float = 0.0,
) -> DataFrame:
    """(from_id, to_id, sim) for every pair sharing ≥1 term.

    ``exclude_self`` implements single-list mode (reference zeroes the
    diagonal, ``_utils.py:84-87,97-98``): join predicate from_id != to_id.
    """
    # alias + rename both sides so self-match (from_vec is to_vec) never hits
    # Spark's ambiguous self-join resolution
    f = from_vec.select(
        F.col("doc_id").alias("from_id"),
        F.col("term").alias("f_term"),
        F.col("weight").alias("w_from"),
    )
    t = to_vec.select(
        F.col("doc_id").alias("to_id"),
        F.col("term").alias("t_term"),
        F.col("weight").alias("w_to"),
    )
    cond = F.col("f_term") == F.col("t_term")
    if exclude_self:
        cond = cond & (F.col("from_id") != F.col("to_id"))
    pairs = (
        f.join(t, cond)
        .groupBy("from_id", "to_id")
        .agg(F.sum(F.col("w_from") * F.col("w_to")).alias("sim"))
    )
    if min_similarity > 0:
        pairs = pairs.where(F.col("sim") >= F.lit(min_similarity))
    return pairs


def cosine_for_candidates(
    candidates: DataFrame,
    from_vec: DataFrame,
    to_vec: DataFrame,
) -> DataFrame:
    """Exact cosine for a pre-blocked candidate set (from_id, to_id).

    Used by the LSH path: candidates come from banded MinHash buckets;
    scoring re-joins the full vectors so the score is exact even though
    candidate generation was approximate.
    """
    f = from_vec.select(
        F.col("doc_id").alias("from_id"), "term", F.col("weight").alias("w_from")
    )
    t = to_vec.select(
        F.col("doc_id").alias("to_id"), "term", F.col("weight").alias("w_to")
    )
    return (
        candidates.join(f, "from_id")
        .join(t, ["to_id", "term"])
        .groupBy("from_id", "to_id")
        .agg(F.sum(F.col("w_from") * F.col("w_to")).alias("sim"))
    )
