"""Deterministic sampling (functions/sampling.py): rescan stability,
monotone rates, per-stratum rate accuracy, shuffle-free plan. The exact
DuckDB twin of the contract query is covered by test_queries_oracle."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.functions.sampling import (
    deterministic_sample,
    deterministic_uniform,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_rescan_stable_and_partitioning_invariant(spark, docs):
    a = sorted(
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.4).collect()
    )
    b = sorted(
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(7, "lang"), "doc_id", 0.4
        ).collect()
    )
    assert a == b and len(a) > 0


def test_rate_monotone_supersets(spark, docs):
    small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.6).collect()}
    assert small < big


def test_salt_draws_independent_sample(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="x").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="y").collect()}
    assert a != b
    # independent coin flips: overlap ≈ rate² of the corpus, loosely bounded
    n = docs.count()
    assert 0.1 * n < len(a & b) < 0.4 * n


def test_stratified_rates_land_near_targets(spark, docs):
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.1}, default_rate=0.9
    )
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_rate = got.get("en", 0) / tot["en"]
    rest_rate = sum(v for k, v in got.items() if k != "en") / sum(
        v for k, v in tot.items() if k != "en"
    )
    assert en_rate < 0.25, en_rate          # 0.1 target, 218-doc stratum
    assert rest_rate > 0.8, rest_rate       # 0.9 target

    # u is a genuine uniform: its mean over the corpus sits near 0.5
    mean_u = docs.select(
        F.avg(deterministic_uniform("doc_id")).alias("m")
    ).collect()[0]["m"]
    assert 0.45 < mean_u < 0.55


def test_leakage_safe_split_keeps_pairs_together(spark, docs):
    """No near-dup pair may straddle the train/test boundary, and both
    splits must be non-trivially populated."""
    from polyfuzz_spark.operators.dedup import (
        leakage_safe_split,
        minhash_near_dups,
    )

    d = docs.select("doc_id", F.col("text").alias("key"))
    pairs = minhash_near_dups(d, n=3, threshold=0.6)
    out = leakage_safe_split(d, pairs, train_frac=0.8).select(
        "doc_id", "split"
    )
    leaked = (
        pairs.join(out.withColumnRenamed("doc_id", "from_id"), "from_id")
        .withColumnRenamed("split", "s_from")
        .join(out.withColumnRenamed("doc_id", "to_id"), "to_id")
        .where(F.col("split") != F.col("s_from"))
        .count()
    )
    assert leaked == 0
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert counts.get("train", 0) > 0.6 * n
    assert counts.get("test", 0) > 0.05 * n


def test_mixture_resample_hits_target_proportions(spark, docs):
    from polyfuzz_spark.functions.sampling import mixture_resample

    weights = {"en": 0.5, "es": 0.25, "de": 0.25}
    kept, rates = mixture_resample(docs, "doc_id", "lang", weights)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(weights)        # non-mixture strata dropped
    # the scarcest stratum (de/0.25) caps the size and keeps rate 1.0
    assert rates["de"] == 1.0
    tot = sum(got.values())
    for s, w in weights.items():
        assert abs(got[s] / tot - w) < 0.08, (s, got[s] / tot)


def test_sample_plan_is_shuffle_free_filter_over_scan(spark, docs):
    plan_df = deterministic_sample(docs.select("doc_id", "lang"), "doc_id", 0.3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Filter" in plan and "Scan parquet" in plan


def test_split_by_key_is_group_atomic(spark):
    from polyfuzz_spark.functions.sampling import split_by_key

    rows = [(i, f"repo{i % 17}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, repo string")
    out = split_by_key(df, "repo", train_frac=0.7, salt="x")
    sides = (
        out.groupBy("repo")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert sides == 1
    splits = {r.repo: r.split for r in out.select("repo", "split").distinct().collect()}
    assert set(splits.values()) == {"train", "test"}
    # map-side: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_split_by_key_twin_equality(spark):
    import duckdb

    from polyfuzz_spark.functions.sampling import (
        split_by_key,
        split_by_key_oracle_sql,
    )

    rows = [(i, f"org{i % 11}/proj{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, repo string")
    got = {
        r.doc_id: r.split
        for r in split_by_key(df, "repo", 0.6, salt="tw").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, repo VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    case = split_by_key_oracle_sql("repo", 0.6, "tw")
    for doc_id, split in con.execute(
        f"SELECT doc_id, {case} FROM t"
    ).fetchall():
        assert got[doc_id] == split
