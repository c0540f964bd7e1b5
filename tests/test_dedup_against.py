"""Incremental cross-snapshot dedup (operators/dedup.py::dedup_against):
planted exact / near / unrelated batch docs against a standing corpus."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.dedup import dedup_against

BASE = (
    "def parse_config(path): return json.load(open(path)) "
    "# shared utility body long enough to shingle densely"
)


@pytest.fixture(scope="module")
def snapshot(spark):
    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, "class Widget: pass  # a completely different corpus file"),
            (3, "xy"),  # too short to emit 3-grams
        ],
        ["doc_id", "key"],
    )
    new = spark.createDataFrame(
        [
            (101, BASE),                      # exact dup -> dropped
            (102, BASE + "!"),                # near dup (j ~ 0.98) -> dropped
            (103, "totally novel content with nothing shared at all zqxw"),
            (104, "xy"),                       # exact dup of short doc 3
            (105, "zq"),                       # short, novel -> survives
        ],
        ["doc_id", "key"],
    )
    return new, corpus


def test_exact_near_and_short_handling(snapshot):
    new, corpus = snapshot
    kept = sorted(
        r.doc_id for r in dedup_against(new, corpus).select("doc_id").collect()
    )
    assert kept == [103, 105]


def test_survivor_rows_unchanged(snapshot):
    new, corpus = snapshot
    out = {r.doc_id: r.key for r in dedup_against(new, corpus).collect()}
    orig = {r.doc_id: r.key for r in new.collect()}
    assert out == {k: orig[k] for k in out}


def test_corpus_never_rewritten(snapshot):
    new, corpus = snapshot
    kept = dedup_against(new, corpus)
    # only new-side ids come back
    assert set(kept.columns) == set(new.columns)
    ids = {r.doc_id for r in kept.collect()}
    assert ids <= {r.doc_id for r in new.collect()}


def test_intra_batch_dups_survive_together(spark):
    """Two copies of the same NEW doc, absent from the corpus: both kept —
    intra-batch dedup is dedup_corpus's job, documented."""
    corpus = spark.createDataFrame([(1, "standing corpus text")], ["doc_id", "key"])
    new = spark.createDataFrame(
        [(101, "fresh duplicated payload body"), (102, "fresh duplicated payload body")],
        ["doc_id", "key"],
    )
    kept = sorted(r.doc_id for r in dedup_against(new, corpus).collect())
    assert kept == [101, 102]


def test_threshold_controls_near_drop(snapshot):
    new, corpus = snapshot
    # at threshold 1.0 only EXACT jaccard/content matches drop; the "+!"
    # variant (102) survives
    kept = sorted(
        r.doc_id
        for r in dedup_against(new, corpus, threshold=1.0)
        .select("doc_id").collect()
    )
    assert 102 in kept and 101 not in kept


def test_custom_id_and_key_cols(spark):
    corpus = spark.createDataFrame(
        [(1, BASE)], ["file_id", "content"]
    )
    new = spark.createDataFrame(
        [(9, BASE), (10, "novel content zz entirely different body")],
        ["file_id", "content"],
    )
    kept = dedup_against(
        new, corpus, key_col="content", id_col="file_id"
    ).collect()
    assert [r.file_id for r in kept] == [10]
