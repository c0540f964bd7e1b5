"""Unit behavior of line-level boilerplate removal
(operators/boilerplate.py): hot-line detection by distinct-doc frequency,
order-preserving reassembly, short-line immunity, byte-identical round-trip
when nothing is hot. The contract query + DuckDB oracle are covered by
test_queries_oracle.py."""

import pytest

from polyfuzz_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)

HEADER = "Copyright (c) Example Corp"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, f"{HEADER}\ndef f():\n    return 1"),
        (2, f"{HEADER}\ndef g():\n{HEADER}\n    return 2"),
        (3, f"{HEADER}\nclass C:\n    pass"),
        (4, "no header here\njust code\n\n{}"),
        (5, ""),  # empty doc survives untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_lines_by_distinct_doc_count(spark, corpus):
    hot = {r.line for r in boilerplate_lines(corpus, min_docs=3).collect()}
    # header is in 3 distinct docs (doc 2's double copy counts once)
    assert hot == {HEADER}
    # raising the bar empties the set
    assert boilerplate_lines(corpus, min_docs=4).count() == 0


def test_strip_preserves_order_and_counts(spark, corpus):
    out = {
        r.doc_id: r
        for r in strip_boilerplate(corpus, min_docs=3).collect()
    }
    assert out[1].text == "def f():\n    return 1"
    assert out[1].n_lines_removed == 1
    # BOTH copies inside doc 2 are removed, order of the rest preserved
    assert out[2].text == "def g():\n    return 2"
    assert out[2].n_lines_removed == 2
    assert out[4].text == "no header here\njust code\n\n{}"
    assert out[4].n_lines_removed == 0
    assert out[5].text == "" and out[5].n_lines_removed == 0


def test_short_lines_never_hot(spark):
    # '{}' and blank lines repeat in every doc but stay (< min_chars)
    rows = [(i, "{}\n\nx%d" % i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_boilerplate(df, min_docs=2).collect()
    assert all(r.n_lines_removed == 0 for r in out)
    assert {r.text for r in out} == {f"{{}}\n\nx{i}" for i in range(5)}


def test_roundtrip_when_nothing_hot(spark, corpus):
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate(corpus, min_docs=10).collect()
    }
    orig = {r.doc_id: r.text for r in corpus.collect()}
    assert out == orig
