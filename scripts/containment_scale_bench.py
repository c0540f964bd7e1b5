#!/usr/bin/env python
"""Containment scale bench: the distinct-gram-set route at corpus sizes
where the gram join has no finite plan.

Corpus model: heavily templated/boilerplate text — ``--templates``
distinct contents over a 12-symbol alphabet (3-gram vocab ≤ 1728, under
``DENSE_MAX_VOCAB``), each duplicated ``--copies`` times (identical
gram sets, the regime the distinct-set reduction exploits). Planted
subset-duplication: template i < P is a strict PREFIX of template P+i,
so every copy of the small template is containment-1000 contained in
every copy of the big one — Jaccard misses all of them by construction.

At these sizes the pre-routing gram join is not merely slow, it is
unplannable: df per gram ≈ n_docs·len/vocab (≈ 49k at 600k docs), so
the equi-join emits Σdf² ≈ 4×10^12 rows. The distinct-set route scores
``--templates`` reps densely and expands pairs through membership —
output-bound, never all-pairs.

Expected output counts (exact, asserted):
  planted cross-template pairs = P · copies²
  intra-set (identical-content) pairs = templates · C(copies, 2)

Two-parallelism protocol (north rule): run back-to-back
    SPARK_GRAFT_CPUS=32 python scripts/containment_scale_bench.py
    taskset -c 0-7 env SPARK_GRAFT_CPUS=8 python scripts/containment_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHABET = "abcdefghijkl"  # 12 symbols -> <= 1728 trigrams
TPL_LEN = 150


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--templates", type=int, default=30_000)
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--planted", type=int, default=5_000)
    args = ap.parse_args()
    assert args.planted * 2 <= args.templates

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.dedup import ngram_containment_pairs
    from polyfuzz_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("containment_scale_bench", cpus=cpus)

    P, C, T = args.planted, args.copies, args.templates

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for tpl in ids:
                # big templates [P, 2P) extend the small template tpl-P:
                # same seeded prefix, then a seeded tail
                base = tpl - P if P <= tpl < 2 * P else tpl
                rng = np.random.default_rng(1_000_003 * base + 7)
                chars = rng.integers(0, len(ALPHABET), TPL_LEN)
                s = "".join(ALPHABET[c] for c in chars)
                if P <= tpl < 2 * P:
                    rng2 = np.random.default_rng(2_000_003 * tpl + 11)
                    tail = rng2.integers(0, len(ALPHABET), TPL_LEN)
                    s = s + "".join(ALPHABET[c] for c in tail)
                texts.append(s)
            yield pd.DataFrame({"tpl": ids, "content": texts})

    tpls = (
        spark.range(T)
        .repartition(cpus * 4)
        .mapInPandas(gen, schema="tpl long, content string")
    )
    docs = (
        tpls.crossJoin(spark.range(C).select(F.col("id").alias("copy")))
        .select(
            (F.col("tpl") * C + F.col("copy")).alias("doc_id"),
            F.col("content").alias("key"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()

    t0 = time.monotonic()
    pairs = ngram_containment_pairs(docs, n=3, threshold=0.9).localCheckpoint(
        eager=True
    )
    n_pairs = pairs.count()
    wall = time.monotonic() - t0

    agg = pairs.select(
        (F.col("contained_id") / C).cast("long").alias("ct"),
        (F.col("container_id") / C).cast("long").alias("cr"),
        "containment_milli",
    ).agg(
        F.sum(
            (
                (F.col("cr") == F.col("ct") + P)
                & (F.col("ct") < P)
                & (F.col("containment_milli") == 1000)
            ).cast("long")
        ).alias("planted"),
        F.sum((F.col("cr") == F.col("ct")).cast("long")).alias("intra"),
    ).first()

    expect_planted = P * C * C
    expect_intra = T * C * (C - 1) // 2
    out = {
        "metric": "containment_docs_per_sec",
        "value": round(n_docs / wall, 1),
        "unit": "docs/sec",
        "cpus": cpus,
        "n_docs": n_docs,
        "templates": T,
        "copies": C,
        "pairs_wall_s": round(wall, 1),
        "n_pairs": n_pairs,
        "planted_found": agg["planted"],
        "planted_expected": expect_planted,
        "intra_found": agg["intra"],
        "intra_expected": expect_intra,
        "planted_recall": round(agg["planted"] / expect_planted, 6),
    }
    print(json.dumps(out))
    assert agg["planted"] == expect_planted, out
    assert agg["intra"] == expect_intra, out


if __name__ == "__main__":
    main()
