"""Hashed-LM perplexity filter (functions/lm.py): exact integer floor_log2
parity, surprisal ordering on planted docs, OOV handling, model identity
(salt/buckets), bucketing semantics, and the broadcast-join plan shape.
Cross-engine twins are covered by the oracle suite (lm_bits_per_token,
lm_quality_buckets)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.functions.lm import (
    bits_per_token,
    floor_log2,
    floor_log2_sql,
    quality_buckets,
    token_buckets,
    train_hashed_lm,
)


def _score(spark, train_rows, score_rows, n_buckets=1 << 16, salt="lm"):
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    score = spark.createDataFrame(score_rows, ["doc_id", "text"])
    lm = train_hashed_lm(train, "text", n_buckets, salt)
    out = bits_per_token(score, lm, "doc_id", "text", n_buckets, salt)
    return {r["doc_id"]: (r["n_tokens"], r["bits_milli"]) for r in out.collect()}


def test_floor_log2_exact_vs_python(spark):
    vals = [1, 2, 3, 4, 7, 8, 255, 256, 1 << 31, (1 << 52) + 12345, (1 << 62) - 1]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {r["x"]: r["fl"] for r in df.select("x", floor_log2(F.col("x")).alias("fl")).collect()}
    con = duckdb.connect()
    for v in vals:
        expect = v.bit_length() - 1
        assert got[v] == expect, v
        (duck,) = con.execute(f"SELECT {floor_log2_sql(str(v))}").fetchone()
        assert duck == expect, v


def test_common_tokens_score_below_rare(spark):
    # reference corpus dominated by "the cat sat"; a doc of those tokens
    # must score (strictly) below a doc of never-seen gibberish
    train = [(i, "the cat sat on the mat") for i in range(20)]
    got = _score(spark, train, [(100, "the cat sat"), (101, "zqx vbn wky")])
    n_head, bits_head = got[100]
    n_tail, bits_tail = got[101]
    assert n_head == 3 and n_tail == 3
    assert bits_head < bits_tail


def test_oov_tokens_get_max_surprisal(spark):
    train = [(0, "alpha beta gamma")]
    nb = 1 << 16
    got = _score(spark, train, [(1, "neverseen")], n_buckets=nb)
    # total=3 → B_tot = floor_log2(3 + 65536) = 16; cnt 0 → fl2(1) = 0
    assert got[1] == (1, 16000)


def test_zero_token_docs_absent(spark):
    got = _score(spark, [(0, "a b c")], [(1, "   "), (2, "a")])
    assert 1 not in got
    assert 2 in got


def test_salt_and_buckets_are_model_identity(spark):
    train = [(i, "the cat sat on the mat rug floor") for i in range(5)]
    score = [(100, "the cat"), (101, "mat rug")]
    a = _score(spark, train, score, salt="lm")
    b = _score(spark, train, score, salt="other")
    c = _score(spark, train, score, n_buckets=1 << 10)
    # same inputs, same knobs → identical; different salt/buckets may move
    # bucket collisions, but every variant still scores both docs
    assert a == _score(spark, train, score, salt="lm")
    assert set(b) == set(a) and set(c) == set(a)


def test_empty_reference_lm_rows(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    lm = train_hashed_lm(empty, "text", 1 << 16)
    score = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_milli"])
        for r in bits_per_token(score, lm, n_buckets=1 << 16).collect()
    }
    # total 0 → every token scores fl2(0 + 2^16) = 16 bits
    assert got == {1: (2, 16000)}


def test_token_buckets_range_and_determinism(spark):
    df = spark.createDataFrame([("x y z zz yy xx",)], ["t"])
    nb = 64
    (row,) = df.select(token_buckets("t", nb).alias("b")).collect()
    assert len(row["b"]) == 6
    assert all(0 <= b < nb for b in row["b"])
    (row2,) = df.select(token_buckets("t", nb).alias("b")).collect()
    assert row["b"] == row2["b"]


def test_quality_buckets_tercile_assignment(spark):
    # 9 docs in one group with strictly increasing scores → 3/3/3 split
    scored = spark.createDataFrame(
        [(i, "g", (i + 1) * 100) for i in range(9)],
        ["doc_id", "lang", "bits_milli"],
    )
    out = quality_buckets(scored, "lang")
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # n=9: t1 = k-th smallest with k = floor(.333*8)+1 = 3 → 300;
    # t2: k = floor(.667*8)+1 = 6 → 600
    assert [got[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_merge_equals_joint_fit(spark):
    """Fitting on two halves and merging must equal fitting on the union
    — the incremental-LM contract (count tables and totals both add)."""
    from polyfuzz_spark.functions.lm import merge_hashed_lms

    h1 = [(i, "the cat sat") for i in range(5)]
    h2 = [(i + 10, "a dog ran far") for i in range(7)]
    nb = 1 << 12
    joint = train_hashed_lm(
        spark.createDataFrame(h1 + h2, ["doc_id", "text"]), "text", nb
    )
    merged = merge_hashed_lms(
        train_hashed_lm(spark.createDataFrame(h1, ["doc_id", "text"]), "text", nb),
        train_hashed_lm(spark.createDataFrame(h2, ["doc_id", "text"]), "text", nb),
    )
    score = spark.createDataFrame(
        [(1, "the dog sat far"), (2, "zz qq")], ["doc_id", "text"]
    )
    a = {r["doc_id"]: r["bits_milli"]
         for r in bits_per_token(score, joint, n_buckets=nb).collect()}
    b = {r["doc_id"]: r["bits_milli"]
         for r in bits_per_token(score, merged, n_buckets=nb).collect()}
    assert a == b and len(a) == 2


def test_save_load_roundtrip_preserves_scores(spark, tmp_path):
    from polyfuzz_spark.functions.lm import load_hashed_lm, save_hashed_lm

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)], ["doc_id", "text"]
    )
    score = spark.createDataFrame([(1, "the cat"), (2, "zqx")], ["doc_id", "text"])
    nb, salt = 1 << 14, "prod"
    lm = train_hashed_lm(train, "text", nb, salt)
    before = {
        r["doc_id"]: r["bits_milli"]
        for r in bits_per_token(score, lm, n_buckets=nb, salt=salt).collect()
    }
    mf = save_hashed_lm(lm, str(tmp_path / "lm"), nb, salt)
    assert mf["n_buckets"] == nb and mf["salt"] == salt
    lm2, mf2 = load_hashed_lm(spark, str(tmp_path / "lm"))
    after = {
        r["doc_id"]: r["bits_milli"]
        for r in bits_per_token(
            score, lm2, n_buckets=mf2["n_buckets"], salt=mf2["salt"]
        ).collect()
    }
    assert before == after


def test_load_rejects_foreign_artifact(spark, tmp_path):
    import json

    from polyfuzz_spark.functions.lm import load_hashed_lm

    d = tmp_path / "x"
    d.mkdir()
    (d / "manifest.json").write_text(json.dumps({"kind": "other"}))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a hashed LM"):
        load_hashed_lm(spark, str(d))


def test_cross_engine_fuzz_random_corpora(spark):
    """Spark scoring vs the DuckDB CTE twin over seeded random corpora
    with adversarial tokens (unicode, punctuation, digits-only, repeated
    hot tokens, long words, empty/whitespace docs) — the floor_log2 /
    bucket arithmetic must agree value-for-value, not just on the
    contract corpus."""
    import random

    import duckdb
    import pandas as pd

    from polyfuzz_spark.functions.lm import lm_score_cte_sql

    alphabet = [
        "the", "cat", "naïve", "héllo", "漢字", "x" * 40, "42", "!?;",
        "a", "_under_score_", "CamelCase", "ümlaut", "'quoted'",
    ]
    nb, salt = 1 << 10, "fuzz"
    for seed in range(6):
        rng = random.Random(seed)
        rows = []
        for i in range(40):
            n = rng.randint(0, 12)
            rows.append((i, " ".join(rng.choice(alphabet) for _ in range(n))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ref = docs.where(F.col("doc_id") % 2 == 0)
        lm = train_hashed_lm(ref, "text", nb, salt)
        got = (
            bits_per_token(docs, lm, n_buckets=nb, salt=salt)
            .orderBy("doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        cte = lm_score_cte_sql(
            "doc_id % 2 = 0", n_buckets=nb, salt=salt
        )
        exp = con.execute(
            f"WITH {cte} SELECT doc_id, n_tokens, bits_milli "
            f"FROM scored ORDER BY doc_id"
        ).df()
        assert got.astype("int64").values.tolist() == \
            exp.astype("int64").values.tolist(), f"seed {seed}"


def test_scoring_plan_broadcasts_model(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(50)], ["doc_id", "text"]
    )
    lm = train_hashed_lm(docs, "text", 1 << 12)
    plan = bits_per_token(docs, lm, n_buckets=1 << 12)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
