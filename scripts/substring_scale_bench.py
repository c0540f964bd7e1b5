#!/usr/bin/env python
"""Exact-substring (span) dedup scale bench: 1M+ docs with a planted
boilerplate block — the hot-window-key regime (VERDICT r03 item 5).

Corpus model: every doc is ``--filler`` globally-unique tokens (derived
from (doc_id, pos) — no cross-doc window can duplicate by chance) and
every ``--plant-every``-th doc carries the SAME ``--block`` -token
boilerplate block appended (a license body / vendored function). With
window n = 13 the only duplicated windows are the block's fully-internal
ones (block − n + 1 per planted doc), all sharing ONE set of
``block − n + 1`` keys whose occurrence count equals the number of
planted docs — the worst-case hot-key shape for the dup-key aggregation,
the occurrences join, and the keep-first canonical-min aggregation.

Exact expectations (asserted):
  * hot-key count      = n_planted                      (skew audit)
  * docs with spans    = n_planted − 1                  (keep_first: the
    canonical min-(id,pos) occurrence survives uncut)
  * every span         = exactly the block token range
  * tokens removed     = (n_planted − 1) · block

Why this scales: every stage is map-side-combinable or an equi-join —
the dup-key agg folds the hot key per-partition before the shuffle
(one reduce row for 300k occurrences), the occurrences⋈dup-keys join
fans out only actual duplicate positions, and keep-first is one
min(struct) agg, never a per-key window sort. The span merge runs
INSIDE each row. Nothing is quadratic in the hot-key count.

Two-parallelism protocol (north rule):
    SPARK_GRAFT_CPUS=32 python scripts/substring_scale_bench.py
    taskset -c 0-7 env SPARK_GRAFT_CPUS=8 python scripts/substring_scale_bench.py
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
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--filler", type=int, default=40)
    ap.add_argument("--block", type=int, default=20)
    ap.add_argument("--plant-every", type=int, default=4)
    ap.add_argument("--n", type=int, default=13)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.substring_dedup import (
        cut_spans,
        duplicated_spans,
        window_occurrences,
    )
    from polyfuzz_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("substring_scale_bench", cpus=cpus,
                      shuffle_partitions=max(2 * cpus, 16))

    N, FILL, BLK, EVERY, n = (
        args.docs, args.filler, args.block, args.plant_every, args.n
    )
    n_planted = (N + EVERY - 1) // EVERY  # doc_id % EVERY == 0

    # synthesis: filler tokens unique per (doc, pos); block tokens shared
    filler = F.transform(
        F.sequence(F.lit(1), F.lit(FILL)),
        lambda i: F.concat(
            F.lit("d"), F.col("id").cast("string"), F.lit("x"),
            i.cast("string"),
        ),
    )
    block = F.array(*[F.lit(f"blk{j}") for j in range(BLK)])
    toks = F.when(
        F.col("id") % EVERY == 0, F.concat(filler, block)
    ).otherwise(filler)
    docs = (
        spark.range(N)
        .repartition(4 * cpus)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
    )

    t0 = time.monotonic()
    docs = docs.localCheckpoint(eager=True)  # synthesis out of the timings
    t_synth = time.monotonic() - t0
    tok0 = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).first()["s"]

    timings: dict[str, float] = {"synth_sec": round(t_synth, 2)}

    # stage 1 — hot-key skew audit on the dup-key aggregation itself
    t0 = time.monotonic()
    from polyfuzz_spark.operators.decontam import gram_keys

    key_counts = (
        gram_keys(docs, n=n, text_col="text", id_col="doc_id")
        .groupBy("gram_key").agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
    ).localCheckpoint(eager=True)
    hot = key_counts.orderBy(F.desc("nd")).limit(5).collect()
    timings["dup_key_agg_sec"] = round(time.monotonic() - t0, 2)
    n_dup_keys = key_counts.count()
    assert n_dup_keys == BLK - n + 1, (n_dup_keys, BLK - n + 1)
    assert hot[0]["nd"] == n_planted, (hot[0]["nd"], n_planted)

    # stage 2 — spans (occurrences ⋈ dup keys, keep-first, in-row merge)
    t0 = time.monotonic()
    spans = duplicated_spans(
        docs, n=n, text_col="text", id_col="doc_id", hashed=True,
        keep_first=True,
    ).localCheckpoint(eager=True)
    n_span_rows = spans.count()
    timings["spans_sec"] = round(time.monotonic() - t0, 2)
    assert n_span_rows == n_planted - 1, (n_span_rows, n_planted - 1)
    bad = spans.where(
        (F.col("tok_start") != FILL + 1) | (F.col("tok_end") != FILL + BLK)
    ).count()
    assert bad == 0, f"{bad} spans off the planted block range"

    # stage 3 — corpus rewrite
    t0 = time.monotonic()
    cut = cut_spans(docs, spans, text_col="text", id_col="doc_id")
    cut = cut.localCheckpoint(eager=True)
    tok1 = cut.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).first()["s"]
    timings["cut_sec"] = round(time.monotonic() - t0, 2)
    assert tok0 - tok1 == (n_planted - 1) * BLK, (tok0, tok1)

    total = timings["dup_key_agg_sec"] + timings["spans_sec"] + timings[
        "cut_sec"
    ]
    out = {
        "bench": "substring_dedup_scale",
        "docs": N,
        "tokens": int(tok0),
        "planted_docs": n_planted,
        "hot_key_count": int(hot[0]["nd"]),
        "hot_key_top5": [int(r["nd"]) for r in hot],
        "cpus": cpus,
        "total_sec": round(total, 2),
        "docs_per_sec": round(N / total),
        "tokens_per_sec": round(tok0 / total),
        **timings,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
