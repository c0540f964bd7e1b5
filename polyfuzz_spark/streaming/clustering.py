"""Streaming cluster maintenance: a clustering that stays converged while
match edges keep arriving.

Connected components is iterative, which Structured Streaming's
incremental model can't express natively — but it doesn't need to: each
micro-batch is a DELTA, and ``incremental_components`` folds a delta into
a converged clustering by contracting old clusters to supernodes (CC cost
O(|batch|), exact — ``tests/test_incremental_cc.py``). So the stream runs
via ``foreachBatch``: the assignments table IS the state, persisted as a
versioned parquet chain ``{state_dir}/v=<batch_id>`` — batch ``b`` reads
the newest version `< b` and overwrites its own, so checkpoint replay
after a crash re-reads the same predecessor state and rewrites the same
output: exactly-once by idempotence, the same recipe as the other
foreachBatch gates here.

At catalog scale the state table is big but each fold touches it through
two equi-joins only (bucketed-by-key state layout serves them
shuffle-free); the CC loop itself only ever sees the contracted batch
graph. Nothing grows with stream history except the state table itself —
one row per clustered key: versions older than ``retain_versions`` are
pruned after each successful fold (the retention window covers the
crash-replay case, which only ever re-reads the newest version below the
replayed batch id).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkage import connected_components, incremental_components

_STATE_SCHEMA = "key string, representative string, cluster_id bigint"


def _prune_versions(state_dir: str, retain: int) -> None:
    try:
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(state_dir)
            if d.startswith("v=")
        )
    except FileNotFoundError:
        return
    for v in versions[:-retain] if retain > 0 else []:
        shutil.rmtree(f"{state_dir}/v={v}", ignore_errors=True)


def latest_state_version(state_dir: str, before: int | None = None) -> int | None:
    """Newest committed state version, optionally restricted to versions
    strictly below ``before`` (what a replayed batch must read)."""
    try:
        versions = [
            int(d.split("=", 1)[1])
            for d in os.listdir(state_dir)
            if d.startswith("v=")
        ]
    except FileNotFoundError:
        return None
    if before is not None:
        versions = [v for v in versions if v < before]
    return max(versions, default=None)


def read_assignments(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current converged clustering (empty-but-typed before the first
    batch commits)."""
    v = latest_state_version(state_dir)
    if v is None:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.parquet(f"{state_dir}/v={v}")


def read_golden(
    spark: SparkSession,
    state_dir: str,
    modal_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The current maintained golden-record table (empty before the first
    fold with ``docs`` configured commits). Pass the stream's
    ``golden_modal_cols`` so the empty-table fallback carries the same
    schema a committed table will (consumers selecting a modal column
    must not see the schema flip with timing)."""
    gdir = os.path.join(state_dir, "golden")
    v = latest_state_version(gdir)
    if v is None:
        schema = ("rep_doc_id string, n_members long, "
                  "longest_doc_id string, golden_sha string")
        for c in modal_cols:
            schema += f", {c} string"
        return spark.createDataFrame([], schema)
    return spark.read.parquet(f"{gdir}/v={v}")


def stream_cluster_maintenance(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    retain_versions: int = 2,
    audit_churn: bool = False,
    docs: DataFrame | None = None,
    golden_modal_cols: tuple[str, ...] = (),
    content_col: str = "key",
):
    """Start the maintenance stream over ``edge_stream`` (src, dst rows).
    Returns the StreamingQuery; read the converged clustering at any time
    with ``read_assignments``.

    Fold rule per micro-batch ``b``: state(< b) exists → fold the batch in
    with ``incremental_components``; no prior state → this batch IS the
    graph, plain ``connected_components``. Either way the result lands at
    ``v=b`` with overwrite (idempotent under checkpoint replay), and
    versions older than the newest ``retain_versions`` are pruned — ≥ 2
    keeps the replay window safe (a replayed batch reads the newest
    version BELOW its id, i.e. at most one behind the newest on disk);
    pass 0 to keep the full audit chain.

    ``audit_churn=True`` additionally writes one JSON line per fold to
    ``{state_dir}/churn/v=<batch_id>.json`` (records moved, churn rate,
    cluster-count shift vs the predecessor state — metrics.cluster_churn
    over the key/representative tables); overwrite-per-version keeps the
    audit exactly-once under replay too.

    Passing ``docs`` (a static corpus keyed like the edge endpoints, with
    ``content_col`` + ``golden_modal_cols``) also maintains the GOLDEN
    RECORD table per fold under ``{state_dir}/golden/v=<batch_id>``:
    clusters the assignment delta touched are re-merged via
    ``survivorship.incremental_golden_records`` (O(delta) recompute, the
    rest passes through) — the full streaming survivorship loop, same
    versioned exactly-once recipe. Read the current table via
    ``read_golden``."""
    spark = edge_stream.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        prev = latest_state_version(state_dir, before=int(batch_id))
        batch = batch_df.select("src", "dst")
        if prev is None:
            state = None
            out = connected_components(batch)
        else:
            state = spark.read.parquet(f"{state_dir}/v={prev}")
            out = incremental_components(
                state.select("key", "representative"), batch
            )
        out.write.mode("overwrite").parquet(f"{state_dir}/v={int(batch_id)}")
        committed = spark.read.parquet(f"{state_dir}/v={int(batch_id)}")
        to_asg = lambda df: df.select(
            F.col("key").alias("doc_id"),
            F.col("representative").alias("rep"),
        )
        if audit_churn:
            import json

            from ..metrics import cluster_churn

            prev_asg = (
                state if state is not None
                else spark.createDataFrame([], _STATE_SCHEMA)
            )
            row = cluster_churn(
                to_asg(prev_asg), to_asg(committed)
            ).collect()[0]
            audit_dir = os.path.join(state_dir, "churn")
            os.makedirs(audit_dir, exist_ok=True)
            with open(
                os.path.join(audit_dir, f"v={int(batch_id)}.json"), "w"
            ) as fh:
                json.dump(row.asDict(), fh)
        if docs is not None:
            from ..operators.survivorship import (
                golden_records,
                incremental_golden_records,
            )

            # docs' doc_id must be STRING, matching the edge keys the
            # assignment tables carry (the equi-joins would otherwise
            # rely on implicit casts)
            gdir = os.path.join(state_dir, "golden")
            gprev = latest_state_version(gdir, before=int(batch_id))
            # lockstep guard: the incremental path is only sound when the
            # predecessor golden version was built against the SAME state
            # this fold diffs from (a run without docs advances the state
            # chain but not the golden chain; folding against a lagged
            # golden base would pass stale rows through the anti-join
            # forever). Any lag -> full recompute.
            if gprev is None or state is None or gprev != prev:
                golden = golden_records(
                    docs, to_asg(committed),
                    content_col=content_col,
                    modal_cols=golden_modal_cols,
                )
            else:
                old_golden = spark.read.parquet(f"{gdir}/v={gprev}")
                golden = incremental_golden_records(
                    docs, old_golden,
                    to_asg(state), to_asg(committed),
                    content_col=content_col,
                    modal_cols=golden_modal_cols,
                )
            golden.write.mode("overwrite").parquet(
                f"{gdir}/v={int(batch_id)}"
            )
            if retain_versions:
                _prune_versions(gdir, max(int(retain_versions), 2))
        if retain_versions:
            _prune_versions(state_dir, max(int(retain_versions), 2))

    writer = (
        edge_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
