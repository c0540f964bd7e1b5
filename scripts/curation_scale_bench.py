#!/usr/bin/env python
"""Scale probe for the round-3 curation family: decontamination + curation
verdict walls over a multi-million-doc synthetic source-code corpus.

The contract queries pin exactness at sf0.01; this measures the claims the
scale-shape docstrings make (operators/decontam.py, functions/curation.py)
at corpus sizes where the shapes matter:

* ``ngram_contamination`` (hashed=True, n=13) with the realistic asymmetry:
  95% train / 5% eval split — the train side reduces to a distinct
  xxhash64-gram set, the eval side semi-joins it.
* ``curation_verdict`` over the full corpus (scalar rules map-side; the
  bigram aggregation is the only shuffle).

Corpus: sources/corpus.generate_corpus (the ER bench generator — planted
near-duplicate entities, so cross-split 13-gram leaks actually exist),
written to parquet once so reruns and parallelism legs read identical bytes.

Usage:
    [SPARK_GRAFT_CPUS=32] python scripts/curation_scale_bench.py \
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
    path = f"/tmp/curation_scale_{n_entities}.parquet"

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

    from polyfuzz_spark.functions.curation import curation_verdict
    from polyfuzz_spark.functions.sampling import deterministic_uniform
    from polyfuzz_spark.operators.decontam import ngram_contamination
    from polyfuzz_spark.sources.corpus import generate_corpus

    if not os.path.exists(path):
        generate_corpus(
            spark, n_entities=n_entities, n_partitions=4 * cpus
        ).write.mode("overwrite").parquet(path)

    docs = spark.read.parquet(path)
    n_docs = docs.count()
    res: dict = {"n_entities": n_entities, "n_docs": n_docs, "cpus": cpus}

    is_train = deterministic_uniform("doc_id", "scale") < F.lit(0.95)
    train, test = docs.where(is_train), docs.where(~is_train)

    t0 = time.monotonic()
    flagged = ngram_contamination(
        train, test, n=13, text_col="content", hashed=True
    )
    res["contaminated_docs"] = flagged.count()
    res["decontam_sec"] = round(time.monotonic() - t0, 1)
    res["eval_docs"] = test.count()

    # code-corpus thresholds (the prose defaults reject all source code:
    # alpha ratio sits at 530-660 milli on this generator); picked off the
    # 5th/95th signal percentiles so both verdicts occur
    t0 = time.monotonic()
    verdict = curation_verdict(
        docs,
        text_col="content",
        min_alpha_milli=550,
        max_dup_token_milli=500,
        max_top_bigram_milli=300,
    )
    res["kept_docs"] = verdict.where("keep").count()
    res["curation_sec"] = round(time.monotonic() - t0, 1)

    res["decontam_docs_per_sec"] = round(n_docs / res["decontam_sec"], 1)
    res["curation_docs_per_sec"] = round(n_docs / res["curation_sec"], 1)
    with open(out, "w") as fh:
        fh.write(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
