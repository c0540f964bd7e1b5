"""Golden-parity tests for the TF-IDF match path.

Golden values from the reference README (`/root/reference/README.md:88-96`)
and test fixtures (`/root/reference/tests/utils.py:1-4`,
`tests/models/test_tfidf.py:9-27`); self-match semantics from
`/root/reference/docs/releases.md:95-118`.
"""

import math

import pytest

from polyfuzz_spark.api import PolyFuzzSpark, lists_to_df


def _matches(spark, from_list, to_list=None, **kw):
    m = PolyFuzzSpark("TF-IDF", spark).match(from_list, to_list, **kw)
    return m.matches_pandas()


def test_readme_goldens(spark, from_list, to_list):
    df = _matches(spark, from_list, to_list)
    rows = {r.From: (r.To, r.Similarity) for r in df.itertuples()}
    assert rows["apple"] == ("apple", 1.0)
    assert rows["apples"] == ("apples", 1.0)
    assert rows["appl"] == ("apple", 0.784)
    assert rows["house"] == ("mouse", 0.588)
    assert rows["recal"][0] is None and rows["recal"][1] == 0.0
    assert rows["similarity"][0] is None and rows["similarity"][1] == 0.0
    assert list(df.columns) == ["From", "To", "Similarity"]
    assert len(df) == 6
    # mean-similarity bound used across reference matcher tests
    assert df.Similarity.mean() > 0.3


def test_single_list_excludes_self(spark):
    df = _matches(spark, ["apple", "apples", "appl"])
    for r in df.itertuples():
        assert r.From != r.To
    assert df.Similarity.min() > 0.5


def test_identical_lists_match_themselves(spark):
    lst = ["apple", "apples", "appl"]
    df = _matches(spark, lst, lst)
    for r in df.itertuples():
        assert r.From == r.To
        assert r.Similarity == 1.0


@pytest.mark.parametrize(
    "ngram_range", [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]
)
def test_ngram_ranges(spark, from_list, to_list, ngram_range):
    # mirrors /root/reference/tests/models/test_tfidf.py:20-27
    from polyfuzz_spark.matchers import TFIDFMatcher

    m = TFIDFMatcher(n_gram_range=ngram_range, min_similarity=0, top_n=1)
    out = m.match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    assert len(out) == 6
    assert out.similarity.mean() > 0.3


def test_min_similarity_cutoff(spark, from_list, to_list):
    from polyfuzz_spark.matchers import TFIDFMatcher

    m = TFIDFMatcher(min_similarity=0.9, top_n=1)
    out = m.match_df(
        lists_to_df(spark, from_list), lists_to_df(spark, to_list)
    ).toPandas()
    # only exact apple/apples survive; others nulled
    kept = out[out.to_key.notna()]
    assert set(kept.from_key) == {"apple", "apples"}
    assert out.similarity.mean() < 0.5


def test_top_n(spark, from_list, to_list):
    m = PolyFuzzSpark("TF-IDF", spark).match(from_list, to_list, top_n=2)
    wide = m.matches_pandas()
    assert list(wide.columns) == [
        "From", "To", "Similarity", "To_2", "Similarity_2"
    ]
    rows = {r.From: r for r in wide.itertuples()}
    assert rows["apple"].To == "apple"
    assert rows["apple"].To_2 == "apples"
    assert 0 < rows["apple"].Similarity_2 < 1


def test_top_n_clamped_to_distinct_to_count(spark, from_list, to_list):
    """Reference _utils.py:54-56: top_n = min(top_n, |set(to_list)|) —
    asking for top_n=5 against 3 distinct to-strings yields exactly
    To_2/To_3 wide columns (never To_4/To_5), with To_k=None /
    Similarity_k=0.0 where a row has no k-th match."""
    m = PolyFuzzSpark("TF-IDF", spark).match(from_list, to_list, top_n=5)
    wide = m.matches_pandas()
    assert list(wide.columns) == [
        "From", "To", "Similarity",
        "To_2", "Similarity_2", "To_3", "Similarity_3",
    ]
    rows = {r.From: r for r in wide.itertuples()}
    # unmatched from-strings pad the full width with None/0.0
    assert rows["recal"].To_2 is None or rows["recal"].To_2 != rows["recal"].To_2
    assert rows["recal"].Similarity_2 == 0.0
    assert rows["recal"].Similarity_3 == 0.0


def test_top_n_columns_exist_even_when_no_row_reaches_rank(spark):
    """A high cutoff can leave every row with at most one match; the wide
    frame must still materialize the full clamped width (reference builds
    columns from top_n, not from observed ranks)."""
    m = PolyFuzzSpark("TF-IDF", spark).match(
        ["apple"], ["apple", "mouse", "bolt"], top_n=2
    )
    wide = m.matches_pandas()
    assert list(wide.columns) == [
        "From", "To", "Similarity", "To_2", "Similarity_2"
    ]
    assert wide.Similarity_2.tolist() == [0.0] or (
        0.0 <= wide.Similarity_2.iloc[0] < 1.0
    )


def test_zero_ngram_strings_get_null(spark):
    # strings shorter than n after cleaning → zero vector → None/0.0
    df = _matches(spark, ["ab", "apple"], ["apple", "apples"])
    rows = {r.From: (r.To, r.Similarity) for r in df.itertuples()}
    assert rows["ab"][0] is None and rows["ab"][1] == 0.0
    assert rows["apple"] == ("apple", 1.0)


def test_sklearn_idf_formula(spark):
    """IDF must be ln((1+N)/(1+df))+1 over the to+from multiset."""
    from polyfuzz_spark.matchers import TFIDFMatcher, _tagged
    from polyfuzz_spark.operators.tfidf import fit_tfidf

    from_df = lists_to_df(spark, ["abc", "abd"])
    to_df = lists_to_df(spark, ["abc"])
    fit = _tagged(to_df, "t:").unionByName(_tagged(from_df, "f:"))
    model = fit_tfidf(fit, "key")
    idf = {r.term: r.idf for r in model.idf.collect()}
    n = 3
    assert math.isclose(idf["abc"], math.log((1 + n) / (1 + 2)) + 1)
    assert math.isclose(idf["abd"], math.log((1 + n) / (1 + 1)) + 1)
