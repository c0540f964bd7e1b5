#!/usr/bin/env python
"""bench.py — headline benchmark for the polyfuzz_spark engine.

Runs the flagship blocked ER pipeline (MinHash blocking → exact cosine
scoring → top-n → transitive clustering) plus every driver-contract query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (cpus, pairs_scored, pairs_per_sec) back the BASELINE.json
throughput metric; run with SPARK_GRAFT_CPUS=8 then 32 for the two-
parallelism scaling-efficiency evidence recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    """Fully execute a plan (noop sink — no driver collect, no skipped stages)
    and return the row count via a cheap second action on the cached result."""
    df = df.cache()
    df.write.format("noop").mode("overwrite").save()
    n = df.count()
    df.unpersist()
    return n


def run_er_pipeline(spark, sf_dir: str) -> dict:
    """Flagship scale path: blocked TF-IDF match → edges → connected
    components. Returns timings + candidate-pair throughput."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.blocking import minhash_candidates
    from polyfuzz_spark.operators.cosine_join import cosine_for_candidates
    from polyfuzz_spark.operators.linkage import connected_components
    from polyfuzz_spark.operators.tfidf import fit_tfidf, vectorize
    from polyfuzz_spark.operators.topk import top_n_matches

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("key"))
        .cache()
    )
    docs.count()

    t0 = time.monotonic()
    cands = minhash_candidates(docs, None, num_hashes=64, bands=16,
                               max_bucket_size=2000)
    cands = cands.cache()
    n_cands = cands.count()
    t_block = time.monotonic() - t0

    t0 = time.monotonic()
    model = fit_tfidf(docs, "key")
    vec = vectorize(model, docs, "key").cache()
    vec.count()
    pairs = cosine_for_candidates(cands, vec, vec).where(
        F.col("from_id") != F.col("to_id")
    )
    matches = top_n_matches(pairs, docs, top_n=3, min_similarity=0.3).cache()
    matches.write.format("noop").mode("overwrite").save()
    t_score = time.monotonic() - t0

    t0 = time.monotonic()
    edges = (
        matches.where(F.col("similarity") > 0.6)
        .select(
            F.col("from_id").cast("string").alias("src"),
            F.col("to_id").cast("string").alias("dst"),
        )
    )
    cc = connected_components(edges)
    n_clustered = _force(cc)
    t_cluster = time.monotonic() - t0

    for df in (cands, vec, matches, docs):
        df.unpersist()
    total = t_block + t_score + t_cluster
    return {
        "er_block_sec": round(t_block, 3),
        "er_score_sec": round(t_score, 3),
        "er_cluster_sec": round(t_cluster, 3),
        "er_total_sec": round(total, 3),
        "pairs_scored": n_cands,
        "pairs_per_sec": round(n_cands / (t_block + t_score), 1),
        "n_clustered": n_clustered,
    }


def main() -> None:
    from polyfuzz_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS,
                      shuffle_partitions=max(2 * CPUS, 16))

    er = run_er_pipeline(spark, SF_DIR)

    from polyfuzz_spark.queries import all_queries

    timings: dict[str, float] = {}
    for name, fn in all_queries().items():
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)
    timings["er_pipeline"] = er["er_total_sec"]

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "cpus": CPUS,
        "pairs_scored": er["pairs_scored"],
        "pairs_per_sec": er["pairs_per_sec"],
        "er_stages": {
            k: er[k] for k in ("er_block_sec", "er_score_sec", "er_cluster_sec")
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
