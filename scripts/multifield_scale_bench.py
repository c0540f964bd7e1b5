#!/usr/bin/env python
"""Multifield-scorer scale bench: candidate-pairs-scored/sec for the
multi-attribute linkage path (blocked equi-join + Arrow-batched JW kernel
+ JVM numeric rules) on a synthetic two-sided catalog.

The blocking key cardinality is chosen so pair mass ≈ PAIRS_TARGET —
measuring the SCORER, not the blocking policy (the policy's pair-mass
control is what the contract query's compound key demonstrates).

    SPARK_GRAFT_CPUS=32 python scripts/multifield_scale_bench.py --rows 500000
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
    ap.add_argument("--rows", type=int, default=500_000,
                    help="rows per side")
    ap.add_argument("--pairs-per-row", type=float, default=8.0,
                    help="target candidate pairs per from-row")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.multifield import (
        FieldSim,
        multifield_score,
    )
    from polyfuzz_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("multifield_scale_bench", cpus=cpus)

    n = args.rows
    # blocks sized so each from-row meets ~pairs_per_row candidates
    n_blocks = max(1, int(n / args.pairs_per_row))
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
             .split())

    def side(id_name):
        base = spark.range(n).select(
            F.col("id").alias(id_name),
            (F.col("id") % n_blocks).alias("blk"),
            F.concat_ws(
                " ",
                F.lit("part"),
                F.element_at(
                    F.array(*[F.lit(w) for w in words]),
                    (F.col("id") % 10 + 1).cast("int"),
                ),
                (F.col("id") % 97).cast("string"),
            ).alias("name"),
            (F.col("id") % 50).cast("int").alias("size"),
        )
        return base

    f_side = side("from_id").withColumnsRenamed(
        {"name": "fn", "size": "fs"}
    )
    t_side = side("to_id").withColumnsRenamed(
        {"name": "tn", "size": "ts"}
    )

    t0 = time.monotonic()
    scored = multifield_score(
        f_side, t_side, ["blk"],
        [
            FieldSim("fn", "tn", 0.7, "jaro_winkler_unit"),
            FieldSim("fs", "ts", 0.3, "numeric", scale=25),
        ],
    )
    n_pairs = scored.where(F.col("score") >= 0.0).count()
    wall = time.monotonic() - t0

    print(json.dumps({
        "rows_per_side": n,
        "n_blocks": n_blocks,
        "pairs_scored": n_pairs,
        "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_pairs / wall, 1),
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
