#!/usr/bin/env python
"""Streaming cluster-maintenance soak (VERDICT r03 item 7): 50+ folds at
100k+ nodes with version pruning, churn audit, golden-table maintenance,
and CRASH REPLAYS at random folds.

Protocol:
  * ``--folds`` edge batches over ``--nodes`` keys are written up front
    (deterministic RNG); the stream consumes them one file per trigger
    (availableNow) in ``--chunks`` separate stream starts — each restart
    exercises checkpoint recovery.
  * After a randomly chosen subset of chunks the newest checkpoint COMMIT
    marker is deleted before the next start — Structured Streaming then
    REPLAYS that micro-batch into a state version that already exists:
    the crash-between-state-write-and-commit window. Exactly-once must
    hold by fold idempotence (overwrite of the same v=<id> from the same
    predecessor).
  * Drain check: the final assignments table must equal one
    connected_components run over ALL edges (hash-equal rows), the churn
    sidecar must cover every fold, the golden table must equal a
    from-scratch golden build, and the state dir must hold at most
    ``retain_versions`` versions.

Run:  python scripts/streaming_soak.py            (~2-4 min, local[32])
      python scripts/streaming_soak.py --folds 12 --nodes 5000   (quick)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGE_SCHEMA = "src string, dst string"


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=120_000)
    ap.add_argument("--edges-per-fold", type=int, default=4_000)
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--crash-chunks", type=int, default=3)
    ap.add_argument("--retain", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/streaming_soak")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.linkage import connected_components
    from polyfuzz_spark.session import get_spark
    from polyfuzz_spark.streaming.clustering import (
        read_assignments,
        read_golden,
        stream_cluster_maintenance,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("streaming_soak", cpus=cpus,
                      shuffle_partitions=max(2 * cpus, 16))

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    in_dir, state_dir, ck_dir = f"{wd}/in", f"{wd}/state", f"{wd}/ck"

    rng = random.Random(args.seed)
    # JVM-side deterministic edge synthesis (xxhash64 endpoints), ONE
    # write job fanned into one file per fold — 50 driver-side
    # createDataFrame+write loops were the dominant cost of the soak.
    # Zero-padded keys: Python's and Spark's string orders agree, so the
    # driver/distributed CC tiers pick identical representatives.
    t0 = time.monotonic()
    ep = lambda salt: F.lpad(
        F.pmod(F.xxhash64("id", F.lit(salt), F.lit(args.seed)),
               F.lit(args.nodes)).cast("string"),
        7, "0",
    )
    (
        spark.range(args.folds * args.edges_per_fold)
        .select(
            (F.col("id") % args.folds).cast("int").alias("fold"),
            ep(1).alias("src"),
            ep(2).alias("dst"),
        )
        .repartition(1)
        .write.partitionBy("fold")
        .parquet(in_dir)
    )
    t_gen = time.monotonic() - t0

    # static corpus for golden maintenance: doc_id matches the edge
    # endpoints; content varies in length so survivorship has real picks
    docs = spark.range(args.nodes).select(
        F.lpad(F.col("id").cast("string"), 7, "0").alias("doc_id"),
        F.concat(
            F.lit("content-"),
            F.repeat(F.lit("x"), (F.col("id") % 17).cast("int")),
            F.col("id").cast("string"),
        ).alias("key"),
        F.concat(F.lit("lang"), (F.col("id") % 5).cast("string")).alias(
            "lang"
        ),
    ).localCheckpoint(eager=True)

    def start_stream():
        # recursiveFileLookup: read the fold=* files WITHOUT partition
        # inference (the fold id is only a file-splitting device; batch
        # identity comes from the stream's own batch ids)
        stream = (
            spark.readStream.schema(EDGE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
        )
        return stream_cluster_maintenance(
            stream, state_dir, ck_dir,
            retain_versions=args.retain, audit_churn=True,
            docs=docs, golden_modal_cols=("lang",),
        )

    crash_after = set(
        rng.sample(range(args.chunks - 1), min(args.crash_chunks,
                                               args.chunks - 1))
    )
    replays = 0
    t0 = time.monotonic()
    for chunk in range(args.chunks):
        q = start_stream()
        q.awaitTermination(600)
        if chunk in crash_after:
            # crash window: state written, checkpoint commit lost
            commits = sorted(os.listdir(f"{ck_dir}/commits"))
            commits = [c for c in commits if not c.startswith(".")]
            if commits:
                os.remove(f"{ck_dir}/commits/{commits[-1]}")
                replays += 1
    t_stream = time.monotonic() - t0

    # ---- drain checks -------------------------------------------------
    got = read_assignments(spark, state_dir)
    all_edges_df = spark.read.option("recursiveFileLookup", "true").schema(
        EDGE_SCHEMA
    ).parquet(in_dir)
    n_edges = all_edges_df.count()
    want = connected_components(all_edges_df)
    g = sorted(map(tuple, got.select("key", "representative").collect()))
    w = sorted(map(tuple, want.select("key", "representative").collect()))
    assert g == w, (
        f"drained state != from-scratch CC ({len(g)} vs {len(w)} rows)"
    )

    versions = [d for d in os.listdir(state_dir) if d.startswith("v=")]
    assert len(versions) <= max(args.retain, 2), versions

    churn_files = os.listdir(f"{state_dir}/churn")
    assert len(churn_files) >= args.folds, (
        f"churn sidecar covers {len(churn_files)} < {args.folds} folds"
    )

    # golden table equals a from-scratch build over the final clustering
    from polyfuzz_spark.operators.survivorship import golden_records

    final_asg = got.select(
        F.col("key").alias("doc_id"),
        F.col("representative").alias("rep"),
    )
    want_golden = golden_records(
        docs, final_asg, content_col="key", modal_cols=("lang",)
    )
    got_golden = read_golden(spark, state_dir)
    gg = sorted(map(tuple, got_golden.select(sorted(got_golden.columns)).collect()))
    wg = sorted(map(tuple, want_golden.select(sorted(want_golden.columns)).collect()))
    assert gg == wg, (
        f"golden table diverged ({len(gg)} vs {len(wg)} rows)"
    )

    n_nodes_clustered = len(g)
    out = {
        "bench": "streaming_soak",
        "folds": args.folds,
        "nodes": args.nodes,
        "edges": int(n_edges),
        "clustered_keys": n_nodes_clustered,
        "chunks": args.chunks,
        "crash_replays": replays,
        "retain_versions": args.retain,
        "state_versions_on_disk": len(versions),
        "gen_sec": round(t_gen, 2),
        "stream_sec": round(t_stream, 2),
        "folds_per_sec": round(args.folds / t_stream, 3),
        "drained_equals_scratch": True,
        "golden_equals_scratch": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
