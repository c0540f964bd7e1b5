"""Subset-duplication (containment) pairs — dedup.ngram_containment_pairs.

Planted prefix-duplication that Jaccard provably misses at any near-dup
threshold; knob behavior (min_grams, max_df, tie orientation)."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

SMALL = "the quick brown fox jumps over the lazy dog"
BIG = SMALL + (
    " and then continues with a very long unrelated tail about spark "
    "partitioning strategies shuffle boundaries broadcast thresholds and "
    "adaptive query execution knobs that dominate the gram set entirely"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, key string")


def test_prefix_duplication_caught_where_jaccard_misses(spark):
    docs = _df(spark, [(1, SMALL), (2, BIG), (3, "something else entirely")])
    got = {
        (r.contained_id, r.container_id): r.containment_milli
        for r in ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert got.keys() == {(1, 2)}
    assert got[(1, 2)] >= 990  # every small gram appears in big
    # Jaccard at the standard near-dup threshold sees nothing
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.7)
    assert jac.where(
        (F.col("from_id") == 1) & (F.col("to_id") == 2)
    ).count() == 0


def test_identical_sets_tie_orients_by_id(spark):
    docs = _df(spark, [(7, "abcabcabc"), (5, "abcabcabc")])
    rows = ngram_containment_pairs(docs, threshold=1.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.contained_id, r.container_id, r.containment_milli) == (
        5, 7, 1000,
    )


def test_min_grams_drops_noisy_tiny_sets(spark):
    # "the" has ONE distinct gram, trivially contained in BIG
    docs = _df(spark, [(1, "the"), (2, BIG)])
    assert ngram_containment_pairs(docs, threshold=0.9).count() == 1
    assert ngram_containment_pairs(
        docs, threshold=0.9, min_grams=5
    ).count() == 0


def test_max_df_cut_recomputes_sizes(spark):
    # one boilerplate gram ("zzz") in every doc; with max_df=2 it is cut
    # and doc 1 ("zzzabc" -> {zza, zab, abc} after cut: {abc}? no:
    # grams of "zzzabc" = zzz zza zab abc; cutting zzz leaves 3) —
    # the assertion pins that cut sizes, not raw sizes, feed the ratio
    docs = _df(
        spark,
        [(1, "zzzabc"), (2, "zzzabcdef"), (3, "zzzqqq"), (4, "zzzqqq!")],
    )
    with_cut = {
        (r.contained_id, r.container_id)
        for r in ngram_containment_pairs(
            docs, threshold=1.0, max_df=2
        ).collect()
    }
    # after cutting "zzz" (df=4): doc1 {zza, zab, abc} fully inside
    # doc2's grams
    assert (1, 2) in with_cut
