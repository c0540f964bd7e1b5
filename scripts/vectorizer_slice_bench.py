#!/usr/bin/env python
"""Packed-vectorizer cache-blocking sweep (round-5 follow-up to the 8→32
inversion; BASELINE.md "32-thread score-stage decomposition").

The score stage's 32-thread wall is dominated by the packed vectorizer's
whole-batch gram/sort working set dividing one shared L3 32 ways. This
sweep times ONLY that kernel — fit IDF once, then vectorize the corpus to
a noop sink — at local[32] over slice sizes, plus a bit-identical check
of the sliced vs unsliced output on a sub-corpus.

Usage:
    python scripts/vectorizer_slice_bench.py [entities] [out.json]
    # default 500_000 entities (~1.25M docs, the BASELINE protocol size)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SLICES = [None, 8192, 4096, 2048, 1024, 512]


def main() -> None:
    entities = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/dev/stdout"

    from polyfuzz_spark.operators import mapside
    from polyfuzz_spark.operators.mapside import (
        fit_idf_mapside,
        vectorize_packed_mapside,
    )
    from polyfuzz_spark.session import get_spark
    from polyfuzz_spark.sources.corpus import generate_corpus

    spark = get_spark("vslice", cpus=32, shuffle_partitions=64)
    from pyspark.sql import functions as F

    corpus = generate_corpus(spark, entities).select(
        "doc_id", F.col("content").alias("key")
    ).localCheckpoint(eager=True)
    n_docs = corpus.count()
    model = fit_idf_mapside(corpus, "key")

    # correctness first: sliced output must be BIT-identical to unsliced
    sub = corpus.limit(20_000).localCheckpoint(eager=True)

    def canon(slice_docs):
        mapside.VECTORIZER_SLICE_DOCS = slice_docs
        rows = vectorize_packed_mapside(model, sub, "key").collect()
        return sorted(
            (r["doc_id"], tuple(r["t"]), tuple(r["w"])) for r in rows
        )

    base = canon(None)
    for s in (2048, 512):
        assert canon(s) == base, f"slice={s} output differs"
    print(f"bit-identical check passed on {len(base)} docs", flush=True)

    results = {}
    for s in SLICES:
        mapside.VECTORIZER_SLICE_DOCS = s
        best = None
        for _ in range(2):  # min-of-2, shared-host protocol
            t0 = time.monotonic()
            vectorize_packed_mapside(model, corpus, "key", compact=True)\
                .write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[str(s)] = round(best, 2)
        print(f"slice={s}: {best:.2f} s", flush=True)

    with open(out_path, "w") as fh:
        json.dump(
            {"n_docs": n_docs, "cpus": 32, "protocol": "min_of_2",
             "vectorize_sec_by_slice": results},
            fh,
        )
    spark.stop()


if __name__ == "__main__":
    main()
