"""Edit-distance matcher + kernel tests.

Mirrors ``/root/reference/tests/models/test_rapidfuzz.py`` and
``test_distance.py``; kernels additionally fuzz-checked against DuckDB
oracles (levenshtein, jaro_winkler_similarity)."""

import random

import duckdb
import pytest

from polyfuzz_spark.api import lists_to_df
from polyfuzz_spark.scorers import kernels as K
from polyfuzz_spark.scorers.editdistance import (
    EditDistanceMatcher,
    RapidFuzzMatcher,
)


# ------------------------------------------------------------- kernels
def test_kernels_vs_duckdb_oracles():
    con = duckdb.connect()
    rng = random.Random(3)
    for _ in range(200):
        n1, n2 = rng.randint(0, 20), rng.randint(0, 20)
        a = "".join(rng.choice("abcdef ") for _ in range(n1))
        b = "".join(rng.choice("abcdef ") for _ in range(n2))
        assert K.levenshtein(a, b) == con.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert K.jaro_winkler(a, b) == pytest.approx(
            con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0],
            abs=1e-9,
        )


def test_bitparallel_lcs_vs_reference_dp():
    """The Allison–Dix bit-string LCS against a plain O(nm) DP, including
    strings > 64 chars (multi-word big-int masks) and unicode."""

    def lcs_dp(a: str, b: str) -> int:
        prev = [0] * (len(b) + 1)
        for ca in a:
            cur = [0]
            for j, cb in enumerate(b, 1):
                cur.append(
                    prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1])
                )
            prev = cur
        return prev[-1]

    rng = random.Random(17)
    alpha = "abcdef 0123é"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 100)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 100)))
        want = lcs_dp(a, b)
        assert K.lcs_length(a, b) == want
        # indel identity the ratio family is built on
        assert K.indel_distance(a, b) == len(a) + len(b) - 2 * want


def test_bitparallel_levenshtein_long_strings():
    """Myers kernel beyond one 64-bit word, fuzzed vs DuckDB."""
    con = duckdb.connect()
    rng = random.Random(23)
    for _ in range(60):
        a = "".join(rng.choice("ab ") for _ in range(rng.randint(60, 150)))
        b = "".join(rng.choice("ab ") for _ in range(rng.randint(60, 150)))
        assert K.levenshtein(a, b) == con.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]


def test_ratio_known_values():
    # published rapidfuzz examples
    assert K.ratio("this is a test", "this is a test!") == pytest.approx(
        96.5517, abs=1e-3
    )
    assert K.wratio("this is a test", "this is a new test!!!") == pytest.approx(
        85.5, abs=0.5
    )
    assert K.token_set_ratio("fuzzy was a bear", "bear a was fuzzy") == 100.0
    assert K.partial_ratio("test", "this is a test!") == 100.0
    assert K.indel_distance("lewenstein", "levenshtein") == 3


# ------------------------------------------------------------ matchers
def test_rapidfuzz_matcher(spark, from_list, to_list):
    out = RapidFuzzMatcher().match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    assert len(out) == 6
    assert out.similarity.mean() > 0.0
    rows = {r.from_key: r for r in out.itertuples()}
    assert rows["apple"].to_key == "apple" and rows["apple"].similarity == 1.0
    # WRatio("appl","apples") = partial_ratio 100 × 0.9 = 90 beats
    # ratio("appl","apple") = 88.9 — matches real rapidfuzz behavior
    assert rows["appl"].to_key == "apples"
    assert rows["appl"].similarity == 0.9


def test_rapidfuzz_score_cutoff(spark, from_list, to_list):
    out = RapidFuzzMatcher(score_cutoff=0.95).match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    assert len(out) == 6
    assert out.similarity.mean() < 0.5
    assert out[out.from_key == "recal"].to_key.iloc[0] is None


def test_editdistance_normalized(spark, from_list, to_list):
    out = EditDistanceMatcher().match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    assert len(out) == 6
    assert out.similarity.mean() > 0.0
    assert out.similarity.min() == 0.0 and out.similarity.max() == 1.0
    # normalization keeps To even at score 0 (unlike the threshold path)
    assert out.to_key.notna().all()


def test_editdistance_no_normalization(spark, from_list, to_list):
    out = EditDistanceMatcher(normalize=False).match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    assert out.similarity.mean() > 50


def test_editdistance_jaro_winkler_scorer(spark, from_list, to_list):
    out = EditDistanceMatcher(scorer="jaro_winkler", normalize=False).match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    rows = {r.from_key: r for r in out.itertuples()}
    assert rows["apple"].similarity == 100.0
    assert rows["appl"].to_key == "apple"


def test_rapidfuzz_self_match_no_mutation(spark):
    # reference RapidFuzz mutates to_list in self mode (bug); we must give
    # order-independent results with the diagonal excluded
    out = RapidFuzzMatcher().match_df(
        lists_to_df(spark, ["apple", "apples", "appl"])
    ).toPandas()
    assert len(out) == 3
    assert (out.from_key != out.to_key).all()


def test_monge_elkan_reordering_and_asymmetry():
    """ME survives token reordering (whole-string JW collapses), is 1.0 on
    permuted token sets, asymmetric by definition, and 0.0 on empty."""
    from polyfuzz_spark.scorers.kernels import jaro_winkler, monge_elkan

    assert monge_elkan("red widget", "widget red") == 1.0
    assert jaro_winkler("red widget", "widget red") < 1.0
    # a ⊂ b: every a-token matches perfectly → me(a,b)=1; me(b,a) < 1
    assert monge_elkan("red", "red widget") == 1.0
    assert monge_elkan("red widget", "red") < 1.0
    assert monge_elkan("", "anything") == 0.0
    assert monge_elkan("anything", "") == 0.0
    # mean of per-token best matches, sequential order
    got = monge_elkan("red bolt", "red widget")
    want = (1.0 + max(
        jaro_winkler("bolt", "red"), jaro_winkler("bolt", "widget")
    )) / 2
    assert got == want


def test_monge_elkan_cross_engine_fuzz():
    """Seeded fuzz of the kernel against the DuckDB list-lambda twin over
    random single-spaced ASCII token strings — the same cross-engine layer
    the LM/DSIR scorers carry. Exact float equality, not approx."""
    import random

    import duckdb

    from polyfuzz_spark.scorers.kernels import monge_elkan

    rng = random.Random(424242)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

    def rand_string():
        return " ".join(
            "".join(rng.choices(alpha, k=rng.randint(1, 8)))
            for _ in range(rng.randint(1, 5))
        )

    con = duckdb.connect()
    q = """
    SELECT list_avg(list_transform(string_split(?, ' '), ta ->
             list_max(list_transform(string_split(?, ' '), tb ->
               jaro_winkler_similarity(ta, tb)))))
    """
    for _ in range(200):
        a, b = rand_string(), rand_string()
        want = con.execute(q, [a, b]).fetchone()[0]
        got = monge_elkan(a, b)
        assert got == want, (a, b, got, want)
