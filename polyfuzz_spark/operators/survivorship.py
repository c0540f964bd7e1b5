"""Golden-record construction (survivorship): one canonical record per
entity cluster, built field-by-field instead of keeping one member row.

The reference stops at row-level grouping (``polyfuzz.py:342-370`` keeps a
representative STRING per group); real entity resolution emits a merged
record — longest/most-complete value for content fields, modal value for
categorical fields, with provenance. This module adds that last stage over
any (id, cluster) assignment table (dedup clusters, ER clusters,
incremental-maintenance output alike).

Scale shape: one equi-join of the corpus onto the assignments (bucketed
layout keeps it shuffle-free on the big side), then per-rule map-side-
combinable aggregations keyed on the cluster representative — argmax via
``min(struct(-measure, tiebreak, payload))`` so each rule is ONE agg, no
window over raw member rows, no per-cluster sort. Modal fields pay one
extra (rep, value) pre-count agg each. Nothing here is driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attach_clusters(
    docs: DataFrame, assignments: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """docs + a ``rep`` column: the cluster representative, or the row's
    own id for singletons (LEFT join — unmatched rows are 1-clusters,
    matching dedup_corpus/dup_cluster_sizes semantics)."""
    asg = assignments.select(id_col, F.col("rep").alias("_rep"))
    return docs.join(asg, id_col, "left").withColumn(
        "rep", F.coalesce(F.col("_rep"), F.col(id_col))
    ).drop("_rep")


def _argmax_struct(measure: Column, tiebreak: Column, *payload: Column):
    """min(struct(-measure, tiebreak, payload...)) — deterministic argmax
    (largest measure, then smallest tiebreak) as ONE map-side-combinable
    aggregate."""
    return F.min(F.struct(
        (-measure).alias("_neg"), tiebreak.alias("_tie"),
        *[p.alias(f"_p{i}") for i, p in enumerate(payload)]
    ))


def golden_records(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "key",
    modal_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One golden record per cluster:

    - ``rep_doc_id``     — cluster representative (min member id)
    - ``n_members``      — cluster population (singletons = 1)
    - ``longest_doc_id`` — provenance: the member whose ``content_col`` is
      longest (tie → min id); its value survives as the golden content
    - ``golden_sha``     — sha256 of the surviving content (the north-rule
      per-row invariant, checkable against the source table)
    - one column per ``modal_cols`` entry — the cluster-modal value
      (tie → min value)

    ``assignments``: (id_col, rep) pairs; rows absent from it are
    singleton clusters of themselves.

    NULL semantics (Spark's ``min(struct(...))`` sorts nulls FIRST, the
    opposite of SQL's default NULLS LAST, so both rules neutralize them
    explicitly): a NULL content never beats real content (its length
    coalesces to −1; an all-null cluster falls back to the min-id member
    with a NULL golden_sha), and NULL categorical values are excluded
    from the modal vote (an all-null cluster gets a NULL modal value via
    the left join).
    """
    members = attach_clusters(docs, assignments, id_col)
    base = members.groupBy("rep").agg(
        F.count(F.lit(1)).alias("n_members"),
        _argmax_struct(
            F.coalesce(F.length(content_col).cast("bigint"), F.lit(-1)),
            F.col(id_col),
            F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256),
        ).alias("_pick"),
        F.max(F.length(content_col)).alias("_has_content"),
    ).select(
        F.col("rep").alias("rep_doc_id"),
        "n_members",
        F.col("_pick._tie").alias("longest_doc_id"),
        F.when(
            F.col("_has_content").isNotNull(), F.col("_pick._p0")
        ).alias("golden_sha"),
    )
    for c in modal_cols:
        counts = members.where(F.col(c).isNotNull()).groupBy("rep", c).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        modal = counts.groupBy("rep").agg(
            _argmax_struct(F.col("_cnt"), F.col(c)).alias("_m")
        ).select(
            F.col("rep").alias("rep_doc_id"), F.col("_m._tie").alias(c)
        )
        base = base.join(modal, "rep_doc_id", "left")
    return base


def incremental_golden_records(
    docs: DataFrame,
    old_golden: DataFrame,
    old_assignments: DataFrame,
    new_assignments: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "key",
    modal_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold an assignment delta into a golden-record table without
    recomputing untouched clusters — the survivorship stage of the
    incremental maintenance loop (``linkage.incremental_components``
    updates the assignments; this updates the merged records).

    Affected clusters are found from the TWO ASSIGNMENT TABLES ALONE
    (full-outer join on the member key; a key absent from one side is a
    singleton of itself there — no corpus scan to detect changes):
    every old and new representative of any key whose membership moved.
    Golden rows for affected clusters are recomputed over just their
    members (one semi-join against the corpus); everything else passes
    through from ``old_golden``. Exact: result ≡ ``golden_records(docs,
    new_assignments)`` (fuzzed in ``tests/test_survivorship.py``).

    At catalog scale the recompute set is O(delta), and the pass-through
    is one anti-join on the cluster key — the corpus is touched only for
    affected members.

    Contract: ``docs`` is the corpus ``old_golden`` was built over, plus
    any additions that appear in ``new_assignments`` (a clustered new doc
    is picked up through its changed assignment; a brand-new UNASSIGNED
    singleton is invisible to the assignment diff — feed additions from
    ``snapshot_diff`` through the assignment batch, or append their
    singleton golden rows directly).
    """
    oa = old_assignments.select(
        F.col(id_col).alias("_k"), F.col("rep").alias("_or")
    )
    na = new_assignments.select(
        F.col(id_col).alias("_k"), F.col("rep").alias("_nr")
    )
    moved = (
        oa.join(na, "_k", "full_outer")
        .select(
            "_k",
            F.coalesce("_or", F.col("_k")).alias("_eff_old"),
            F.coalesce("_nr", F.col("_k")).alias("_eff_new"),
        )
        .where(F.col("_eff_old") != F.col("_eff_new"))
    )
    affected = (
        moved.select(F.col("_eff_old").alias("rep"))
        .unionByName(moved.select(F.col("_eff_new").alias("rep")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # members of affected NEW clusters: assigned members whose new rep is
    # affected, plus affected singleton reps themselves (rep == own key)
    member_keys = (
        new_assignments.join(
            affected.select(F.col("rep")), "rep", "left_semi"
        ).select(F.col(id_col))
        .unionByName(affected.select(F.col("rep").alias(id_col)))
        .distinct()
    )
    docs_subset = docs.join(member_keys, id_col, "left_semi")
    asg_subset = new_assignments.join(
        affected.select("rep"), "rep", "left_semi"
    ).select(id_col, "rep")
    recomputed = golden_records(
        docs_subset, asg_subset,
        id_col=id_col, content_col=content_col, modal_cols=modal_cols,
    )
    # a doc id that was an affected old rep but no longer exists as a
    # cluster (members moved away AND the doc itself now lives under a
    # different rep) must not resurface: recomputed only contains reps
    # that actually head a cluster or are genuine singletons among
    # member_keys — but an affected old rep whose key is now a MEMBER of
    # another affected cluster appears in docs_subset under that cluster,
    # not as its own golden row. Pass-through drops every affected rep.
    kept = old_golden.join(
        affected.select(F.col("rep").alias("rep_doc_id")),
        "rep_doc_id",
        "left_anti",
    )
    return kept.unionByName(recomputed)
