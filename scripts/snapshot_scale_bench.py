#!/usr/bin/env python
"""Snapshot-index scale bench: what index reuse buys per ingest batch.

Compares, on the same synthetic source-code corpus split (standing corpus
vs incoming batch):

  A. ``dedup.dedup_against``            — recomputes the corpus side
  B. ``snapshot.build_snapshot_index``  — one-time corpus reduction
     ``snapshot.dedup_against_snapshot_index`` — per-batch cost with the
     corpus side READ from parquet artifacts

At T snapshots the recompute path costs T × (corpus + batch) while the
index path costs 1 × corpus + T × batch — the gap below is the per-batch
saving. Corpus size is chosen just above BLOCKED_KNOBS_MIN_DOCS so both
paths auto-resolve the measured-safe SCALE blocking regime.

    SPARK_GRAFT_CPUS=32 python scripts/snapshot_scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=250_000)
    ap.add_argument("--skip-recompute", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.dedup import dedup_against
    from polyfuzz_spark.operators.snapshot import (
        build_snapshot_index,
        dedup_against_snapshot_index,
    )
    from polyfuzz_spark.session import get_spark
    from polyfuzz_spark.sources.corpus import generate_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("snapshot_scale_bench", cpus=cpus)

    docs = generate_corpus(spark, n_entities=args.entities).select(
        "doc_id", F.col("content").alias("key")
    )
    # doc-level split so an entity's variants straddle the boundary —
    # the batch really does carry near-dups OF THE CORPUS
    corpus = docs.where(F.col("doc_id") % 10 != 0).localCheckpoint(
        eager=True
    )
    batch = docs.where(F.col("doc_id") % 10 == 0).localCheckpoint(
        eager=True
    )
    n_corpus, n_batch = corpus.count(), batch.count()

    out: dict = {
        "metric": "snapshot_index_batch_docs_per_sec",
        "unit": "docs/sec",
        "cpus": cpus,
        "corpus_docs": n_corpus,
        "batch_docs": n_batch,
    }

    t0 = time.monotonic()
    path = os.path.join(tempfile.mkdtemp(prefix="snapix"), "ix")
    build_snapshot_index(corpus, path)
    out["build_index_s"] = round(time.monotonic() - t0, 1)

    t1 = time.monotonic()
    surv_ix = dedup_against_snapshot_index(batch, path).count()
    out["index_dedup_s"] = round(time.monotonic() - t1, 1)
    out["survivors_index"] = surv_ix
    out["value"] = round(n_batch / (time.monotonic() - t1), 1)

    if not args.skip_recompute:
        t2 = time.monotonic()
        surv_rc = dedup_against(batch, corpus).count()
        out["recompute_dedup_s"] = round(time.monotonic() - t2, 1)
        out["survivors_recompute"] = surv_rc
        out["survivors_equal"] = surv_ix == surv_rc

    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
