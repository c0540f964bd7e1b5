"""Grouping orchestration (operators G4 + J7).

Reference: ``/root/reference/polyfuzz/polyfuzz.py:459-484`` (_create_groups):
distinct non-null To strings (or From when group_all_strings) → self-match
with the grouper model → single linkage over edges with sim > threshold →
map the To column through cluster representatives (fallback: To itself).

Spark shape: the representative join (J7) is a broadcast-able dimension join
— the assignments table is ≤ |distinct matched strings|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import content_id128
from .linkage import connected_components, filter_edges


def add_groups(
    matches: DataFrame,
    grouper,
    link_min_similarity: float = 0.75,
    group_all_strings: bool = False,
):
    """Returns (matches + group column, assignments(key, cluster_id,
    representative))."""
    if "group" in matches.columns:  # re-grouping overwrites, like the reference
        matches = matches.drop("group")
    src_col = "from_key" if group_all_strings else "to_key"
    strings = (
        matches.where(F.col(src_col).isNotNull())
        .select(F.col(src_col).alias("key"))
        .distinct()
    )
    # stable content-derived ids (monotonically_increasing_id is partition-
    # dependent and non-resumable). 128-bit: a 64-bit id silently merges
    # two distinct strings into one node at ~n²/2⁶⁵ expected collisions —
    # real at corpus scale (see functions/ids.py); the struct id joins,
    # groups, windows, and orders exactly like a scalar.
    strings = strings.select(content_id128("key").alias("doc_id"), "key")

    self_matches = grouper.match_df(strings)  # to_df=None → self, diag excluded
    edges = filter_edges(self_matches, link_min_similarity)
    assignments = connected_components(edges)

    # dimension join; AQE broadcast-converts it when assignments are small —
    # not forced, because at corpus scale the cluster table can exceed the
    # broadcast threshold
    grouped = (
        matches.join(
            assignments.select(
                F.col("key").alias("to_key"),
                F.col("representative").alias("group"),
            ),
            "to_key",
            "left",
        )
        .withColumn("group", F.coalesce("group", "to_key"))
        .select(
            "from_id", "from_key", "to_id", "to_key", "rank", "similarity",
            "group",
        )
    )
    return grouped, assignments
