#!/usr/bin/env python
"""spark-submit entrypoint for the checkpointed corpus-curation pipeline
(training-data preparation: scrub → strip → curate → dedup → split →
decontaminate).

Cluster:
    python scripts/package.py                       # builds dist/polyfuzz_spark.zip
    spark-submit --py-files dist/polyfuzz_spark.zip \
        scripts/run_curation_pipeline.py \
        --corpus iceberg_or_parquet_path --run-dir s3://bucket/runs/cur42

Sandbox (local mode is chosen automatically when no master is set):
    python scripts/run_curation_pipeline.py --synth-entities 2000 \
        --run-dir /tmp/cur42

Resumable: re-running with the same --run-dir skips stages whose manifest
is complete (kill-and-resume is exercised in tests/test_curation_pipeline.py).
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
    p.add_argument("--min-alpha-milli", type=int, default=400,
                   help="alpha-ratio gate (the synthetic code corpus sits "
                        "~530-700 milli; prose corpora can use 800)")
    p.add_argument("--boiler-min-docs", type=int, default=100)
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--max-bucket-size", type=int, default=None,
                   help="band-bucket cap for the split stage's near-dup "
                        "join; default: size-resolved from the deduped "
                        "corpus (adaptive.resolve_blocking_knobs)")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.plans.curation import CurationConfig, CurationPipeline
    from polyfuzz_spark.session import get_spark

    spark = get_spark("curation_pipeline")
    if args.synth_entities:
        from polyfuzz_spark.sources.corpus import generate_corpus

        corpus = generate_corpus(spark, args.synth_entities)
    else:
        if not args.corpus:
            p.error("pass --corpus or --synth-entities")
        corpus = spark.read.parquet(args.corpus)
        if "doc_id" not in corpus.columns:
            corpus = corpus.withColumn(
                "doc_id", F.xxhash64("repo", "path", "commit")
            )

    cfg = CurationConfig(
        min_alpha_milli=args.min_alpha_milli,
        boiler_min_docs=args.boiler_min_docs,
        train_frac=args.train_frac,
        max_bucket_size=args.max_bucket_size,
    )
    result = CurationPipeline(spark, args.run_dir, cfg).run(corpus)
    print(json.dumps({s: m.get("rows") for s, m in result.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
