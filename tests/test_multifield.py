"""Multi-attribute scoring operator (operators/multifield.py): field-rule
kinds, weight order, null semantics, blocking behavior."""

from pyspark.sql import functions as F

from polyfuzz_spark.operators.multifield import (
    FieldSim,
    blocked_pairs,
    multifield_score,
)


def _sides(spark, f_rows, t_rows):
    f = spark.createDataFrame(
        f_rows, "from_id long, fn string, fs int, blk string"
    )
    t = spark.createDataFrame(
        t_rows, "to_id long, tn string, ts int, blk string"
    )
    return f, t


def test_weighted_sum_and_kinds(spark):
    f, t = _sides(spark, [(1, "abc", 5, "x")], [(2, "abc", 9, "x")])
    out = multifield_score(
        f, t, ["blk"],
        [
            FieldSim("fn", "tn", 0.7, "jaro_winkler_unit"),
            FieldSim("fs", "ts", 0.3, "numeric", scale=8),
        ],
    ).collect()[0]
    # jw(abc,abc)=1.0; numeric: 1 - 4/8 = 0.5
    assert abs(out.score - (0.7 * 1.0 + 0.3 * 0.5)) < 1e-12


def test_equal_kind_and_null_fields_score_zero_not_null(spark):
    f, t = _sides(spark, [(1, None, None, "x")], [(2, "abc", 3, "x")])
    out = multifield_score(
        f, t, ["blk"],
        [
            FieldSim("fn", "tn", 0.5, "equal"),
            FieldSim("fs", "ts", 0.5, "numeric", scale=10),
        ],
    ).collect()[0]
    # null fields contribute 0 to their term; the score stays non-null
    assert out.score == 0.0


def test_null_blocking_keys_never_pair(spark):
    f, t = _sides(
        spark, [(1, "a", 1, None), (3, "a", 1, "x")],
        [(2, "a", 1, None), (4, "a", 1, "x")],
    )
    rows = blocked_pairs(f, t, ["blk"]).select("from_id", "to_id").collect()
    assert [(r.from_id, r.to_id) for r in rows] == [(3, 4)]


def test_compound_key_restricts_candidates(spark):
    f = spark.createDataFrame(
        [(1, "a", "t1", "b1"), (3, "a", "t1", "b2")],
        "from_id long, fn string, k1 string, k2 string",
    )
    t = spark.createDataFrame(
        [(2, "a", "t1", "b1"), (4, "a", "t1", "b2")],
        "to_id long, tn string, k1 string, k2 string",
    )
    single = blocked_pairs(f, t, ["k1"]).count()
    compound = blocked_pairs(f, t, ["k1", "k2"]).count()
    assert (single, compound) == (4, 2)


def test_unknown_field_kind_fails_at_plan_time(spark):
    import pytest

    from polyfuzz_spark.operators.multifield import FieldSim, multifield_score

    f, t = _sides(spark, [(1, "a", 1, "x")], [(2, "a", 1, "x")])
    with pytest.raises(ValueError, match="unknown FieldSim kind"):
        multifield_score(
            f, t, ["blk"], [FieldSim("fn", "tn", 1.0, "jaro-winkler")]
        )


def test_percent_scale_kernels_normalized_to_unit(spark):
    """Percent-scale kernels (ratio, WRatio, levenshtein_sim: 0–100) are
    divided by 100 inside field_score so the weighted sum stays unit
    scale — FieldSim('fn','tn',0.6,'ratio') on identical strings must
    contribute 0.6, not 60."""
    f, t = _sides(spark, [(1, "abc", 5, "x")], [(2, "abc", 9, "x")])
    out = multifield_score(
        f, t, ["blk"], [FieldSim("fn", "tn", 0.6, "ratio")]
    ).collect()[0]
    assert abs(out.score - 0.6) < 1e-9

    # unit-scale kernels pass through untouched (no double /100)
    out2 = multifield_score(
        f, t, ["blk"], [FieldSim("fn", "tn", 0.6, "jaro_winkler_unit")]
    ).collect()[0]
    assert abs(out2.score - 0.6) < 1e-9


def test_rapidfuzz_matcher_monge_elkan_unit_scale(spark):
    """The matcher path must not /100 the unit-scale kernel (a squashed
    score would empty every match table above any real cutoff)."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.scorers.editdistance import RapidFuzzMatcher

    docs = spark.createDataFrame(
        [(0, "red widget"), (1, "widget red"), (2, "blue bolt")],
        "doc_id long, key string",
    )
    m = RapidFuzzMatcher(scorer="monge_elkan", score_cutoff=0.9)
    out = m.match_df(docs).where(F.col("from_id") == 0).collect()
    assert out and out[0].to_id == 1 and out[0].similarity >= 0.99
