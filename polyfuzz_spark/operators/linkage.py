"""Transitive clustering: edge filter + iterative connected components
(operators G1-G3).

Reference: ``/root/reference/polyfuzz/linkage.py:5-53`` — a single ordered
pass over edges (single linkage) that is order-dependent, NOT a full
transitive closure (a From already mapped never pulls its To in), and breaks
on falsy keys (``""``). We deliberately implement true transitive closure
with deterministic representatives — a documented semantic upgrade mandated
by the north rule — and verify the reference's golden clusters still hold.

Algorithm: min-label propagation on the undirected edge set.
    label(v) ← min(label(v), min_{(u,v)∈E} label(u)),   iterate to fixpoint.
Each iteration is one shuffle (groupBy(node).min — map-side combinable, so
hot nodes from giant components partial-aggregate before the shuffle; AQE
skew-join splitting covers the join side). ``localCheckpoint`` truncates
lineage each round so plans don't grow with iteration count. Convergence in
O(log(diameter)) rounds with the large-star/small-star-style doubling we get
from propagating labels (not ids) through both directions.

Labels ARE the min string key, so the converged label doubles as the
deterministic cluster representative (G3; divergence from the reference's
insertion-order representative is documented + tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_edges(matches: DataFrame, min_similarity: float = 0.75) -> DataFrame:
    """G1 — strictly-greater threshold (reference linkage.py:25)."""
    return (
        matches.where(
            F.col("similarity") > F.lit(min_similarity)
        )
        .where(F.col("to_key").isNotNull())
        .select(
            F.col("from_key").alias("src"), F.col("to_key").alias("dst")
        )
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """(key, representative) for every node reachable through edges.

    ``edges``: (src: string, dst: string). Returns ONLY nodes that appear in
    at least one edge (singletons are not clusters, matching the reference:
    unmatched strings never enter cluster_mapping).
    """
    spark = edges.sparkSession
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    # size the iteration shuffles to the edge set: the driver loop pays
    # per-partition task overhead × iterations × jobs, so a small graph on a
    # large-session shuffle count (e.g. 64) spends more time scheduling than
    # propagating labels. Restored after convergence.
    n_edges = sym.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    cc_parts = max(8, min(int(old_parts), n_edges // 250_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))

    labels = (
        sym.select(F.col("src").alias("key"))
        .distinct()
        .withColumn("label", F.col("key"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # push every node's current label to each neighbor, take the min of
        # (own label, incoming labels)
        incoming = (
            sym.join(labels, sym["src"] == labels["key"])
            .select(sym["dst"].alias("key"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(incoming)
            .groupBy("key")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "key")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels.select(
        "key",
        F.col("label").alias("representative"),
        F.xxhash64("label").alias("cluster_id"),
    )
