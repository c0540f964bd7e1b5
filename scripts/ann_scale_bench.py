#!/usr/bin/env python
"""ANN scale probe: IVF / LSH top-k over a synthetic million-vector corpus.

The contract tables cap out at a few thousand embeddings — far below where
the ANN paths' shapes matter — so this script measures the claims BASELINE.md
makes about them at 10^6 vectors on this box:

* wall-clock of ``ivf_cosine_topk`` / ``lsh_cosine_topk`` self-match top-3,
* recall@1/@3 against EXACT brute force on a deterministic query sample
  (exact side = the IVF machinery at n_probe == n_cells, which degenerates
  to brute force — the same equivalence the fullprobe contract query
  oracle-proves at sf0.01).

Corpus: deterministic mixture model — K concept centers (seeded RNG), each
vector = L2-normalized(center[id % K] + sigma * noise(seed=id)), generated
DISTRIBUTED via mapInPandas (no driver materialization) and written to
parquet so both legs read identical bytes.

Usage:
    python scripts/ann_scale_bench.py [n_vectors] [out_json]
Defaults: 1_000_000 vectors, stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K_CENTERS = 1024
SIGMA = 0.35
N_SAMPLE = 1000  # recall-eval query sample
SEED = 7


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/stdout"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    path = f"/tmp/ann_scale_{n}.parquet"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(path):
        centers = np.random.default_rng(SEED).standard_normal((K_CENTERS, DIM))
        bc = spark.sparkContext.broadcast(centers)

        def gen(batches):
            import pandas as pd

            C = bc.value
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                # per-row seeded noise: regeneration-stable regardless of
                # partitioning
                noise = np.vstack(
                    [
                        np.random.default_rng(SEED * 10_000_019 + i)
                        .standard_normal(DIM)
                        for i in ids
                    ]
                )
                V = C[ids % K_CENTERS] + SIGMA * noise
                V /= np.linalg.norm(V, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {"vec_id": ids,
                     "embedding": [r.astype(np.float32) for r in V]}
                )

        (
            spark.range(n, numPartitions=4 * cpus)
            .mapInPandas(gen, schema="vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(path)
        )

    from polyfuzz_spark.operators.knn import ivf_cosine_topk, lsh_cosine_topk

    e = spark.read.parquet(path)
    n_cells = max(64, int((n / 4000) ** 0.5) * 32)  # ~sqrt-ish growth
    res: dict = {"n": n, "dim": DIM, "cpus": cpus, "n_cells": n_cells}

    # the approximate legs run compact (float32 through the replicated
    # bucket shuffle — the scale configuration; they are rows-only by
    # design). The exact ground-truth leg below stays float64.
    compact = os.environ.get("ANN_BENCH_COMPACT", "1") == "1"
    res["compact"] = compact

    t0 = time.monotonic()
    ivf = ivf_cosine_topk(
        e, e, k=3, n_cells=n_cells, n_probe=8, exclude_self=True,
        compact=compact,
    ).localCheckpoint(eager=True)
    res["ivf_rows"] = ivf.count()
    res["ivf_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    lsh = lsh_cosine_topk(
        e, e, k=3, dim=DIM, n_planes=12, n_tables=8, exclude_self=True,
        compact=compact,
    ).localCheckpoint(eager=True)
    res["lsh_rows"] = lsh.count()
    res["lsh_sec"] = round(time.monotonic() - t0, 1)

    # exact ground truth for a deterministic query sample: full-probe IVF
    # (brute force by construction, oracle-proven equivalence at sf0.01)
    sample = e.where(F.pmod(F.xxhash64("vec_id"), F.lit(n // N_SAMPLE)) == 0)
    n_q = sample.count()
    t0 = time.monotonic()
    exact = ivf_cosine_topk(
        sample, e, k=3, n_cells=n_cells, n_probe=n_cells, exclude_self=True
    ).toPandas()
    res["exact_sample_sec"] = round(time.monotonic() - t0, 1)
    res["n_sample_queries"] = n_q

    def recall(approx_df, at: int) -> float:
        a = (
            approx_df.where(F.col("rank") <= at)
            .toPandas()
            .groupby("query_id")["neighbor_id"]
            .apply(set)
        )
        ex = (
            exact[exact["rank"] <= at]
            .groupby("query_id")["neighbor_id"]
            .apply(set)
        )
        joined = ex.to_frame("e").join(a.to_frame("a"))
        hits = sum(
            len(r.e & r.a) if isinstance(r.a, set) else 0
            for r in joined.itertuples()
        )
        return round(hits / max(sum(len(s) for s in joined.e), 1), 4)

    q_ids = set(exact["query_id"].unique())
    ivf_s = ivf.where(F.col("query_id").isin(q_ids))
    lsh_s = lsh.where(F.col("query_id").isin(q_ids))
    res["ivf_recall_at1"] = recall(ivf_s, 1)
    res["ivf_recall_at3"] = recall(ivf_s, 3)
    res["lsh_recall_at1"] = recall(lsh_s, 1)
    res["lsh_recall_at3"] = recall(lsh_s, 3)

    with open(out, "w") as fh:
        fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
