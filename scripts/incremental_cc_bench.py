#!/usr/bin/env python
"""Incremental-cluster-maintenance scale bench: what supernode contraction
buys per snapshot delta.

Builds a large converged clustering (chains of CLUSTER_SIZE nodes — the
shape of near-dup families), then folds in a delta batch that (a) merges
every MERGE_EVERY-th adjacent cluster pair and (b) attaches brand-new
nodes, two ways:

  A. ``linkage.connected_components``     — full recompute over old ∪ new
  B. ``linkage.incremental_components``   — contract old clusters to their
     representative, CC over the O(|batch|) contracted graph only

Both outputs are compared row-for-row (must be identical — the oracle
invariant of ``cluster_assignments_incremental``). At T snapshots the
recompute path costs T × CC(full graph) while maintenance costs
1 × CC(initial) + T × fold(batch) — the wall gap below is the per-snapshot
saving.

    SPARK_GRAFT_CPUS=32 python scripts/incremental_cc_bench.py --nodes 5000000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5_000_000)
    ap.add_argument("--cluster-size", type=int, default=10)
    ap.add_argument("--merge-every", type=int, default=100)
    ap.add_argument("--new-nodes", type=int, default=10_000)
    ap.add_argument("--skip-equality", action="store_true")
    ap.add_argument("--changed-only", action="store_true",
                    help="measure the O(delta) upsert-output fold as well")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.linkage import (
        connected_components,
        incremental_components,
    )
    from polyfuzz_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("incremental_cc_bench", cpus=cpus)

    n, cs = args.nodes, args.cluster_size
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")
    ids = spark.range(n)

    # old graph: within-cluster chains (node i — i+1 unless i closes a
    # cluster). Chain diameter = cluster size → CC needs O(log cs) rounds.
    old_edges = ids.where(F.col("id") % cs != cs - 1).select(
        pad(F.col("id")).alias("src"), pad(F.col("id") + 1).alias("dst")
    )
    # delta batch: exactly the edges the old graph excluded, for every
    # MERGE_EVERY-th cluster boundary (adjacent-cluster merges), plus
    # NEW_NODES brand-new nodes attaching to spread-out cluster heads
    merges = ids.where(
        (F.col("id") % cs == cs - 1)
        & ((F.col("id") / cs).cast("long") % args.merge_every == 0)
        & (F.col("id") + 1 < n)
    ).select(pad(F.col("id")).alias("src"), pad(F.col("id") + 1).alias("dst"))
    attach = spark.range(args.new_nodes).select(
        pad(F.col("id") + n).alias("src"),
        pad((F.col("id") * 7919) % n).alias("dst"),
    )
    batch = merges.unionByName(attach).localCheckpoint(eager=True)
    n_old = old_edges.count()
    n_batch = batch.count()

    t0 = time.monotonic()
    base = connected_components(old_edges).localCheckpoint(eager=True)
    base.count()
    t_initial = time.monotonic() - t0

    t0 = time.monotonic()
    incr = incremental_components(base, batch).localCheckpoint(eager=True)
    n_incr = incr.count()
    t_incr = time.monotonic() - t0

    t_upsert = n_upsert = None
    if args.changed_only:
        t0 = time.monotonic()
        ups = incremental_components(
            base, batch, changed_only=True
        ).localCheckpoint(eager=True)
        n_upsert = ups.count()
        t_upsert = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    full = connected_components(
        old_edges.unionByName(batch)
    ).localCheckpoint(eager=True)
    n_full = full.count()
    t_full = time.monotonic() - t0

    mismatches = None
    if not args.skip_equality:
        joined = incr.select("key", F.col("representative").alias("ri")).join(
            full.select("key", F.col("representative").alias("rf")),
            "key",
            "full_outer",
        )
        mismatches = joined.where(
            ~(F.col("ri").eqNullSafe(F.col("rf")))
        ).count()

    print(json.dumps({
        "nodes": n,
        "cluster_size": cs,
        "old_edges": n_old,
        "batch_edges": n_batch,
        "initial_cc_sec": round(t_initial, 2),
        "incremental_fold_sec": round(t_incr, 2),
        "upsert_fold_sec": t_upsert,
        "upsert_rows": n_upsert,
        "full_recompute_sec": round(t_full, 2),
        "speedup_per_snapshot": round(t_full / t_incr, 2) if t_incr else None,
        "rows_incremental": n_incr,
        "rows_full": n_full,
        "rep_mismatches": mismatches,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
