"""DSIR importance resampling (operators/dsir.py): planted domain
selection, bag-of-ngrams multiplicity, bigram featurization, top-k
determinism, and plan shapes. The cross-engine twin is covered by the
oracle suite (dsir_weights)."""

from pyspark.sql import functions as F

from polyfuzz_spark.operators.dsir import (
    doc_features,
    dsir_select,
    dsir_weights,
)


def _weights(spark, raw_rows, target_rows, **kw):
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(target_rows, ["doc_id", "text"])
    out = dsir_weights(raw, tgt, n_buckets=1 << 16, **kw)
    return {r["doc_id"]: (r["n_feats"], r["llr_bits"]) for r in out.collect()}


def test_target_like_docs_outrank_off_domain(spark):
    # target domain: python-ish; raw corpus: half python-ish, half prose.
    # DSIR must rank the python-ish raw docs above the prose ones.
    py = "def main import os return self None elif lambda yield"
    prose = "the quick brown fox jumps over the lazy dog again and again"
    raw = [(i, py) for i in range(5)] + [(i + 100, prose) for i in range(5)]
    target = [(i + 1000, py) for i in range(10)]
    got = _weights(spark, raw, target)
    py_scores = [got[i][1] for i in range(5)]
    prose_scores = [got[i + 100][1] for i in range(5)]
    assert min(py_scores) > max(prose_scores)


def test_feature_multiplicity_is_a_bag_not_a_set(spark):
    feats = doc_features(
        spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"]),
        n_buckets=1 << 16,
    )
    counts = {
        r["bucket"]: r["c"]
        for r in feats.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    }
    # 4 unigrams (a×3, b×1) + 3 bigrams ("a a"×2, "a b"×1) = 7 occurrences
    assert sum(counts.values()) == 7
    assert max(counts.values()) == 3  # the "a" unigram kept its multiplicity


def test_single_token_doc_has_no_bigrams(spark):
    got = _weights(spark, [(1, "solo")], [(2, "solo")])
    assert got[1][0] == 1  # n_feats: one unigram, zero bigrams


def test_zero_token_docs_absent(spark):
    got = _weights(spark, [(1, "   "), (2, "x")], [(3, "x")])
    assert 1 not in got and 2 in got


def test_n_feats_counts_unigrams_plus_bigrams(spark):
    got = _weights(spark, [(1, "a b c d")], [(2, "a b")])
    assert got[1][0] == 4 + 3


def test_select_topk_deterministic_tiebreak(spark):
    w = spark.createDataFrame(
        [(3, 1, 10), (1, 1, 10), (2, 1, 10), (4, 1, 5)],
        ["doc_id", "n_feats", "llr_bits"],
    )
    got = [r["doc_id"] for r in dsir_select(w, 2).collect()]
    assert got == [1, 2]  # equal weights → ascending doc_id wins


def test_cross_engine_fuzz_random_corpora(spark):
    """Spark weights vs the DuckDB CTE twin over seeded random corpora
    with adversarial tokens — bigram windows, bucket hashing and the
    four-term floor_log2 LLR must agree value-for-value."""
    import random

    import duckdb
    import pandas as pd

    from polyfuzz_spark.operators.dsir import dsir_oracle_cte_sql

    alphabet = [
        "def", "self", "naïve", "漢字", "y" * 30, "7", "::", "words",
        "the", "snake_case", "Mixed", "ß",
    ]
    nb, salt = 1 << 10, "fz"
    for seed in range(5):
        rng = random.Random(100 + seed)
        rows = []
        for i in range(35):
            n = rng.randint(0, 10)
            rows.append((i, " ".join(rng.choice(alphabet) for _ in range(n))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.where(F.col("doc_id") % 3 == 0)
        got = (
            dsir_weights(docs, target, n_buckets=nb, salt=salt)
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        cte = dsir_oracle_cte_sql(
            "doc_id % 3 = 0", n_buckets=nb, salt=salt
        )
        exp = con.execute(
            f"WITH {cte} SELECT doc_id, n_feats, llr_bits "
            f"FROM weighted ORDER BY doc_id"
        ).df()
        assert got.astype("int64").values.tolist() == \
            exp.astype("int64").values.tolist(), f"seed {seed}"


def test_plan_shapes(spark):
    raw = spark.createDataFrame([(i, "a b c") for i in range(40)], ["doc_id", "text"])
    tgt = spark.createDataFrame([(i, "a b") for i in range(10)], ["doc_id", "text"])
    w = dsir_weights(raw, tgt, n_buckets=1 << 12)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # model join must broadcast
    sel_plan = dsir_select(w, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in sel_plan  # never a global sort
