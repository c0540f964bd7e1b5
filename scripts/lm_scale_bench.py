#!/usr/bin/env python
"""Scale probe for the tokenizer/LM/data-selection family (round-3
continuation session): hashed-LM scoring, DSIR weighting, and BPE
training/encoding walls over a multi-million-doc synthetic corpus.

The contract queries pin exactness at sf0.01; this measures the
scale-shape claims (functions/lm.py, operators/dsir.py, operators/bpe.py)
where they matter, and emits parallelism-invariance checksums (sum of
bits_milli / llr_bits, merge-table hash) so 8-core and 32-core legs can be
asserted identical output-wise.

Usage:
    [SPARK_GRAFT_CPUS=32] python scripts/lm_scale_bench.py \
        [n_entities] [out_json]
Defaults: 800_000 entities (~2M docs), stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/stdout"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    path = f"/tmp/lm_scale_{n_entities}.parquet"

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

    from polyfuzz_spark.functions.lm import bits_per_token, train_hashed_lm
    from polyfuzz_spark.functions.sampling import deterministic_uniform
    from polyfuzz_spark.operators.bpe import bpe_encode, learn_bpe, word_counts
    from polyfuzz_spark.operators.dsir import dsir_weights
    from polyfuzz_spark.sources.corpus import generate_corpus

    if not os.path.exists(path):
        generate_corpus(
            spark, n_entities=n_entities, n_partitions=4 * cpus
        ).write.mode("overwrite").parquet(path)

    docs = spark.read.parquet(path)
    n_docs = docs.count()
    res: dict = {"n_entities": n_entities, "n_docs": n_docs, "cpus": cpus}

    # --- hashed-LM: fit on the md5 25% "trusted" subset, score everything
    t0 = time.monotonic()
    ref = docs.where(deterministic_uniform("doc_id", "ref") < F.lit(0.25))
    lm = train_hashed_lm(ref, "content")
    scored = bits_per_token(docs, lm, "doc_id", "content")
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bits_milli").alias("sum_bits"),
        F.sum("n_tokens").alias("sum_tokens"),
    ).collect()[0]
    res["lm_score_sec"] = round(time.monotonic() - t0, 1)
    res["lm_scored_docs"] = row["n"]
    res["lm_sum_bits"] = int(row["sum_bits"])          # invariance checksum
    res["lm_tokens_per_sec"] = round(row["sum_tokens"] / res["lm_score_sec"])
    res["lm_docs_per_sec"] = round(row["n"] / res["lm_score_sec"], 1)

    # --- DSIR: weight every doc, target = the md5 20% subset
    t0 = time.monotonic()
    target = docs.where(deterministic_uniform("doc_id", "tgt") < F.lit(0.2))
    w = dsir_weights(docs, target, "doc_id", "content")
    row = w.agg(
        F.count(F.lit(1)).alias("n"), F.sum("llr_bits").alias("s")
    ).collect()[0]
    res["dsir_sec"] = round(time.monotonic() - t0, 1)
    res["dsir_docs"] = row["n"]
    res["dsir_sum_llr"] = int(row["s"])                # invariance checksum
    res["dsir_docs_per_sec"] = round(row["n"] / res["dsir_sec"], 1)

    # --- BPE: corpus word counts -> 50 merges; encode a 100k-doc slice
    t0 = time.monotonic()
    wc = word_counts(docs, "content", min_count=2)
    res["bpe_distinct_words"] = wc.count()
    res["bpe_wordcount_sec"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    merges = learn_bpe(
        wc, 50, max_words=5_000_000, allow_truncate=True
    ).localCheckpoint(eager=True)
    res["bpe_learn_sec"] = round(time.monotonic() - t0, 1)
    first = merges.orderBy("rank").limit(3).collect()
    res["bpe_first_merges"] = [f"{r['left']}+{r['right']}" for r in first]
    t0 = time.monotonic()
    slice_df = docs.where(deterministic_uniform("doc_id", "enc") < F.lit(
        min(1.0, 100_000 / max(n_docs, 1))
    ))
    enc = bpe_encode(slice_df, merges, text_col="content")
    row = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bpe_tokens").alias("pieces"),
        F.sum("n_tokens").alias("toks"),
    ).collect()[0]
    res["bpe_encode_sec"] = round(time.monotonic() - t0, 1)
    res["bpe_encoded_docs"] = row["n"]
    res["bpe_pieces"] = int(row["pieces"])             # invariance checksum
    res["bpe_encode_tokens_per_sec"] = round(row["toks"] / res["bpe_encode_sec"])

    with open(out, "w") as fh:
        fh.write(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
