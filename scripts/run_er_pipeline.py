#!/usr/bin/env python
"""spark-submit entrypoint for the checkpointed ER pipeline (north-rule
deployment path).

Cluster:
    python scripts/package.py                       # builds dist/polyfuzz_spark.zip
    spark-submit --py-files dist/polyfuzz_spark.zip \
        scripts/run_er_pipeline.py \
        --corpus iceberg_or_parquet_path --run-dir s3://bucket/runs/run42

Sandbox (local mode is chosen automatically when no master is set):
    python scripts/run_er_pipeline.py --synth-entities 2000 --run-dir /tmp/run42

Resumable: re-running with the same --run-dir skips stages whose manifest
is complete (kill-and-resume is exercised in tests/test_pipeline_e2e.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", help="parquet path of the corpus table "
                   "(repo, path, commit, lang, content[, content_sha256])")
    p.add_argument("--synth-entities", type=int, default=0,
                   help="generate the deterministic synthetic corpus instead")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--min-similarity", type=float, default=0.8)
    p.add_argument("--link-min-similarity", type=float, default=0.8)
    p.add_argument("--top-n", type=int, default=5)
    p.add_argument("--max-bucket-size", type=int, default=200)
    p.add_argument("--min-shared-bands", type=int, default=1)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.plans.pipeline import ERConfig, ERPipeline
    from polyfuzz_spark.session import get_spark

    spark = get_spark("er_pipeline")
    if args.synth_entities:
        from polyfuzz_spark.sources.corpus import generate_corpus

        corpus = generate_corpus(spark, args.synth_entities)
    else:
        if not args.corpus:
            p.error("pass --corpus or --synth-entities")
        corpus = spark.read.parquet(args.corpus)
        if "doc_id" not in corpus.columns:
            # 128-bit content-derived id: deterministic under any
            # partitioning, collision-safe at the 10^12-file target
            # (functions/ids.py)
            from polyfuzz_spark.functions.ids import content_id128

            corpus = corpus.withColumn(
                "doc_id", content_id128("repo", "path", "commit")
            )

    cfg = ERConfig(
        min_similarity=args.min_similarity,
        link_min_similarity=args.link_min_similarity,
        top_n=args.top_n,
        max_bucket_size=args.max_bucket_size,
        min_shared_bands=args.min_shared_bands,
    )
    result = ERPipeline(spark, args.run_dir, cfg).run(corpus)
    print(json.dumps({s: m.get("rows") for s, m in result.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
