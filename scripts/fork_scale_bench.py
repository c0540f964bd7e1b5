#!/usr/bin/env python
"""Fork-detection scale bench: group-level Jaccard over a synthetic
(repo, file-fingerprint) universe with planted forks and a planted
boilerplate item, at the box's two parallelism levels (north-rule
protocol: same job, N vs 4N cores — pin the 8-leg with
``taskset -c 0-7`` as BASELINE.md's other legs do).

    SPARK_GRAFT_CPUS=32 python scripts/fork_scale_bench.py --repos 200000
    taskset -c 0-7 env SPARK_GRAFT_CPUS=8 python scripts/fork_scale_bench.py --repos 200000

Layout (deterministic, map-side from spark.range — no data files):
- ``--repos`` repos × ``--files`` files each; fingerprints are
  sha2(repo:file) so cross-repo collisions don't exist by construction.
- every repo whose id ≡ 1 (mod 10) is a FORK of its predecessor: it
  borrows the predecessor's first 80% of fingerprints → planted Jaccard
  = 0.8/(2-0.8) ≈ 0.666 (666 milli exactly at the default 20 files).
- every repo also carries one shared LICENSE fingerprint — df = n_repos.
  Without the ``max_df`` cut this single item contributes C(n_repos, 2)
  pair rows (~2×10^10 at 200k repos); the cut drops it before the join.
  The planted-pair count asserts the cut didn't cost recall.

Output: one JSON line {repos, items, pairs, families, wall_s, cpus, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repos", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--max-df", type=int, default=50)
    ap.add_argument("--skip-families", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.groupsim import fork_groups, group_jaccard_pairs
    from polyfuzz_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fork_scale_bench", cpus=cpus)

    n_repos, n_files = args.repos, args.files
    borrow = (n_files * 8) // 10  # fork borrows 80% of predecessor files

    base = spark.range(n_repos * n_files).select(
        (F.col("id") / n_files).cast("long").alias("repo_id"),
        (F.col("id") % n_files).alias("file_idx"),
    )
    is_fork = (F.col("repo_id") % 10 == 1) & (F.col("repo_id") > 0)
    src_repo = F.when(
        is_fork & (F.col("file_idx") < borrow), F.col("repo_id") - 1
    ).otherwise(F.col("repo_id"))
    items = base.select(
        F.col("repo_id").cast("string").alias("group_key"),
        F.sha2(
            F.concat_ws(":", src_repo.cast("string"),
                        F.col("file_idx").cast("string")), 256
        ).alias("item_key"),
    )
    lic = spark.range(n_repos).select(
        F.col("id").cast("string").alias("group_key"),
        F.lit("LICENSE-boilerplate").alias("item_key"),
    )
    items = items.unionByName(lic)

    t0 = time.monotonic()
    pairs = group_jaccard_pairs(
        items, min_jaccard_milli=500, max_df=args.max_df
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.monotonic() - t0

    expected_pairs = sum(
        1 for r in range(1, n_repos) if r % 10 == 1
    )
    n_fam = None
    t_fam = None
    if not args.skip_families:
        t1 = time.monotonic()
        fams = fork_groups(pairs, items, fork_min_milli=600)
        n_fam = fams.where(
            F.col("group_key") != F.col("fork_rep")
        ).count()
        t_fam = round(time.monotonic() - t1, 1)

    print(json.dumps({
        "metric": "fork_detection_items_per_sec",
        "value": round((n_repos * n_files + n_repos) / t_pairs, 1),
        "unit": "items/sec",
        "cpus": cpus,
        "repos": n_repos,
        "items": n_repos * n_files + n_repos,
        "pairs_found": n_pairs,
        "pairs_expected": expected_pairs,
        "recall_ok": n_pairs == expected_pairs,
        "fork_members": n_fam,
        "wall_pairs_s": round(t_pairs, 1),
        "wall_families_s": t_fam,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
