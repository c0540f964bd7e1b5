"""Exact grouped quantiles (operators/quantiles.py): hand-computed
k-th-smallest semantics, duplicate-heavy histograms, dtype guard. The
cross-engine twin is covered by the oracle suite (quality_percentiles)."""

import pytest

from polyfuzz_spark.operators.quantiles import grouped_exact_quantiles


def _q(spark, rows, ps):
    df = spark.createDataFrame(rows, ["g", "v"])
    out = grouped_exact_quantiles(df, "g", "v", ps).collect()
    return {(r["g"], r["p_milli"]): (r["value"], r["n"]) for r in out}


def test_kth_smallest_semantics(spark):
    rows = [("a", v) for v in [5, 1, 3, 2, 4]]
    got = _q(spark, rows, [0, 500, 1000])
    # n=5: k = floor(p*(n-1)) + 1 → 1, 3, 5
    assert got[("a", 0)] == (1, 5)
    assert got[("a", 500)] == (3, 5)
    assert got[("a", 1000)] == (5, 5)


def test_duplicates_collapse_into_buckets(spark):
    rows = [("a", 1)] * 3 + [("a", 9)]
    got = _q(spark, rows, [500, 1000])
    assert got[("a", 500)] == (1, 4)   # k = floor(0.5*3)+1 = 2 → value 1
    assert got[("a", 1000)] == (9, 4)  # k = 4 → value 9
    # exactly one row per (group, p)
    assert len(got) == 2


def test_multi_group_independent(spark):
    rows = [("a", v) for v in range(10)] + [("b", 100)]
    got = _q(spark, rows, [900])
    assert got[("a", 900)] == (8, 10)  # k = floor(0.9*9)+1 = 9 → value 8
    assert got[("b", 900)] == (100, 1)  # n=1 → k=1


def test_rejects_non_integer_values(spark):
    df = spark.createDataFrame([("a", 1.5)], ["g", "v"])
    with pytest.raises(ValueError, match="integer value column"):
        grouped_exact_quantiles(df, "g", "v", [500])


def test_rejects_bad_ps(spark):
    df = spark.createDataFrame([("a", 1)], ["g", "v"])
    with pytest.raises(ValueError):
        grouped_exact_quantiles(df, "g", "v", [1500])
    with pytest.raises(ValueError):
        grouped_exact_quantiles(df, "g", "v", [])
