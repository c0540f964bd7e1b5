"""Unit behavior of the decontamination operator (operators/decontam.py):
planted-leak detection, within-doc gram dedup, short-doc handling, hashed
scale-path parity, and the drop verb. The contract query + DuckDB oracle are
covered by test_queries_oracle.py."""

import pytest

from polyfuzz_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
    word_ngrams,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpora(spark):
    train = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "import numpy as np  def main(): pass"),
            (3, "short doc"),
        ],
    )
    test = _df(
        spark,
        [
            # shares the 3-gram windows of "quick brown fox jumps"
            (10, "she saw the quick brown fox jumps today"),
            # clean
            (11, "completely unrelated text with no overlap whatsoever"),
            # shares "import numpy as" exactly once, but repeats it twice
            (12, "import numpy as x then import numpy as y"),
            # shorter than n -> never flagged, never emits grams
            (13, "tiny"),
        ],
    )
    return train, test


def test_word_ngrams_window_and_dedup(spark):
    df = _df(spark, [(1, "a b a b a"), (2, "x y")])
    got = {
        (r.doc_id, r.gram)
        for r in word_ngrams(df, n=3).collect()
    }
    # 3 windows in doc 1 but only 2 DISTINCT grams; doc 2 too short
    assert got == {(1, "a b a"), (1, "b a b")}


def test_planted_leak_flagged_with_evidence(spark, corpora):
    train, test = corpora
    out = {
        r.doc_id: (r.n_shared_grams, r.evidence_gram)
        for r in ngram_contamination(train, test, n=3).collect()
    }
    # doc 10 shares windows of "the quick brown fox jumps":
    #   "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[10] == (3, "brown fox jumps")
    # doc 12's repeated "import numpy as" counts ONCE (distinct grams)
    assert out[12] == (1, "import numpy as")
    assert 11 not in out and 13 not in out


def test_hashed_path_matches_string_path(spark, corpora):
    train, test = corpora
    plain = ngram_contamination(train, test, n=3, hashed=False)
    hashed = ngram_contamination(train, test, n=3, hashed=True)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, hashed.collect())
    )


def test_decontaminate_drops_only_flagged(spark, corpora):
    train, test = corpora
    kept = {r.doc_id for r in decontaminate(train, test, n=3).collect()}
    assert kept == {11, 13}


def test_no_overlap_when_n_exceeds_shared_span(spark, corpora):
    train, test = corpora
    # longest shared token run is 5 ("the quick brown fox jumps");
    # n=6 finds nothing
    assert ngram_contamination(train, test, n=6).count() == 0


def test_n_validation(spark, corpora):
    train, _ = corpora
    with pytest.raises(ValueError):
        word_ngrams(train, n=0)


def test_rolling_ids_match_string_grams(spark, corpora):
    """contaminated_ids (token-hash windows, no gram strings) flags exactly
    the docs ngram_contamination flags, with identical shared-gram counts —
    collisions would only ever ADD a flag, and none occur here."""
    from polyfuzz_spark.operators.decontam import contaminated_ids

    train, test = corpora
    want = {
        (r.doc_id, r.n_shared_grams)
        for r in ngram_contamination(train, test, n=3).collect()
    }
    got = {
        (r.doc_id, r.n_shared_grams)
        for r in contaminated_ids(train, test, n=3).collect()
    }
    assert got == want and want  # non-vacuous


def test_rolling_decontaminate_matches_string_path(spark, corpora):
    train, test = corpora
    a = sorted(
        r.doc_id for r in decontaminate(train, test, n=3).collect()
    )
    b = sorted(
        r.doc_id
        for r in decontaminate(train, test, n=3, rolling=True).collect()
    )
    assert a == b


def test_gram_keys_short_docs_emit_nothing(spark):
    from polyfuzz_spark.operators.decontam import gram_keys

    df = _df(spark, [(1, "only two"), (2, "a b c d e")])
    out = gram_keys(df, n=3).groupBy("doc_id").count().collect()
    got = {r.doc_id: r["count"] for r in out}
    assert got == {2: 3}


def test_contamination_fraction_planted_values(spark, corpora):
    from polyfuzz_spark.operators.decontam import contamination_fraction

    train, test = corpora
    out = {
        r.doc_id: (r.n_grams, r.n_shared_grams, r.contamination_milli)
        for r in contamination_fraction(
            train, test, n=3, rolling=False
        ).collect()
    }
    # doc 10: 8 tokens -> 6 windows, 3 leaked -> 500 milli
    assert out[10] == (6, 3, 500)
    # doc 11: 7 tokens -> 5 windows, clean
    assert out[11] == (5, 0, 0)
    # doc 12: 9 tokens -> 7 windows, but "import numpy as" repeats ->
    # 6 DISTINCT grams, 1 leaked -> 166 milli
    assert out[12] == (6, 1, 166)
    # doc 13 shorter than n: no row at all
    assert 13 not in out


def test_contamination_fraction_rolling_matches_string(spark, corpora):
    from polyfuzz_spark.operators.decontam import contamination_fraction

    train, test = corpora
    s = contamination_fraction(train, test, n=3, rolling=False)
    h = contamination_fraction(train, test, n=3, rolling=True)
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, h.collect()))
