#!/usr/bin/env python
"""spark-submit entrypoint for streaming cluster maintenance: keep a
clustering converged while match-edge files keep arriving.

Cluster:
    python scripts/package.py                       # builds dist/polyfuzz_spark.zip
    spark-submit --py-files dist/polyfuzz_spark.zip \
        scripts/run_cluster_maintenance.py \
        --edges-dir s3://bucket/match-edges --state-dir s3://bucket/cluster-state \
        --checkpoint-dir s3://bucket/ck/maint1 --follow

Sandbox:
    python scripts/run_cluster_maintenance.py \
        --edges-dir /tmp/edges --state-dir /tmp/state --checkpoint-dir /tmp/ck

Each micro-batch folds into the converged assignments via supernode
contraction (CC cost O(|batch|)); the state is a versioned parquet chain,
replay-idempotent under the checkpoint. Default drains available files
and exits (availableNow); --follow runs continuously.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--edges-dir", required=True,
                   help="parquet dir of (src string, dst string) edge files")
    p.add_argument("--state-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--max-files-per-trigger", type=int, default=16)
    p.add_argument("--retain-versions", type=int, default=2)
    p.add_argument("--follow", action="store_true",
                   help="run continuously instead of drain-and-exit")
    p.add_argument("--audit-churn", action="store_true",
                   help="write per-fold churn JSON under state-dir/churn")
    args = p.parse_args()

    from polyfuzz_spark.session import get_spark
    from polyfuzz_spark.streaming.clustering import (
        read_assignments,
        stream_cluster_maintenance,
    )

    spark = get_spark("cluster_maintenance")
    stream = (
        spark.readStream.schema("src string, dst string")
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.edges_dir)
    )
    q = stream_cluster_maintenance(
        stream,
        args.state_dir,
        args.checkpoint_dir,
        available_now=not args.follow,
        retain_versions=args.retain_versions,
        audit_churn=args.audit_churn,
    )
    if args.follow:
        q.awaitTermination()
        return
    q.awaitTermination()
    asg = read_assignments(spark, args.state_dir)
    print(json.dumps({
        "clustered_keys": asg.count(),
        "clusters": asg.select("representative").distinct().count(),
        "state_dir": args.state_dir,
    }))


if __name__ == "__main__":
    main()
