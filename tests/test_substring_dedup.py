"""Exact-substring (span-level) dedup: planted duplicated blocks, canonical
keep-one, island merging, hashed==string parity, byte-exact reconstruction
(operators/substring_dedup.py; the distributed form of Lee et al. ACL 2022
ExactSubstr dedup)."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.substring_dedup import (
    cut_spans,
    dedup_substrings,
    duplicated_spans,
    duplicated_window_hits,
    window_occurrences,
)

SHARED = "a b c d e f g h i j k l m"  # exactly 13 tokens
N = 13


def _toks(s):
    return [t for t in s.split() if t]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # canonical occurrence (min doc_id, pos): keeps the block
            (1, f"x1 y1 {SHARED} z1 w1"),
            # same block mid-doc: cut
            (2, f"p q {SHARED} r s t"),
            # block at doc start plus enough tail to stay its own doc
            (3, f"{SHARED} tail0 tail1 tail2 tail3 tail4 tail5"),
            # no duplication
            (4, "totally unrelated text with no duplication at all here"),
            # too short to hold any 13-token window
            (5, "short doc"),
        ],
        ["doc_id", "text"],
    )


def test_window_occurrences_positions(spark):
    df = spark.createDataFrame([(7, "t0 t1 t2 t3")], ["doc_id", "text"])
    occ = window_occurrences(df, n=3).orderBy("pos").collect()
    assert [(r.pos, r.gram) for r in occ] == [
        (1, "t0 t1 t2"),
        (2, "t1 t2 t3"),
    ]
    # shorter than n emits nothing
    short = spark.createDataFrame([(8, "t0 t1")], ["doc_id", "text"])
    assert window_occurrences(short, n=3).count() == 0


def test_keep_first_excludes_canonical(corpus):
    spans = duplicated_spans(corpus, n=N).collect()
    got = {(r.doc_id, r.tok_start, r.tok_end) for r in spans}
    # doc 1 (canonical) has NO span; doc 2 block at tokens 3..15; doc 3 at
    # 1..13
    assert got == {(2, 3, 15), (3, 1, 13)}


def test_keep_first_false_flags_all_occurrences(corpus):
    spans = duplicated_spans(corpus, n=N, keep_first=False).collect()
    got = {(r.doc_id, r.tok_start, r.tok_end) for r in spans}
    assert got == {(1, 3, 15), (2, 3, 15), (3, 1, 13)}


def test_within_doc_repetition_not_flagged(spark):
    # the same 13-token block twice in ONE doc, nowhere else: repetition,
    # not cross-doc duplication
    df = spark.createDataFrame(
        [(1, f"{SHARED} mid {SHARED}"), (2, "other text entirely")],
        ["doc_id", "text"],
    )
    assert duplicated_spans(df, n=N).count() == 0


def test_overlapping_windows_merge_to_one_span(spark):
    # a 20-token shared block = 8 duplicated windows -> ONE merged span
    block = " ".join(f"s{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, f"lead {block}"), (2, f"{block} trail x y z")],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(df, n=N).collect()
    assert [(r.doc_id, r.tok_start, r.tok_end) for r in spans] == [
        (2, 1, 20)
    ]


def test_disjoint_blocks_stay_separate_spans(spark):
    block_a = " ".join(f"a{i}" for i in range(13))
    block_b = " ".join(f"b{i}" for i in range(13))
    gap = " ".join(f"g{i}" for i in range(14))  # > n tokens between them
    df = spark.createDataFrame(
        [
            (1, f"{block_a} one {block_b}"),
            (2, f"{block_a} {gap} {block_b}"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        (r.doc_id, r.tok_start, r.tok_end)
        for r in duplicated_spans(df, n=N).collect()
    }
    # doc 1 canonical for both blocks; doc 2 gets two disjoint spans
    assert spans == {(2, 1, 13), (2, 28, 40)}


def test_hashed_matches_string_route(corpus):
    a = sorted(duplicated_spans(corpus, n=N, hashed=False).collect())
    b = sorted(duplicated_spans(corpus, n=N, hashed=True).collect())
    assert a == b


def test_cut_rewrites_exactly(corpus):
    out = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in dedup_substrings(corpus, n=N).collect()
    }
    assert len(out) == 5  # every row survives
    assert out[1] == (f"x1 y1 {SHARED} z1 w1", 0)  # canonical untouched
    assert out[2] == ("p q r s t", 13)
    assert out[3] == ("tail0 tail1 tail2 tail3 tail4 tail5", 13)
    assert out[4][1] == 0
    assert out[5] == ("short doc", 0)
    # conservation: surviving tokens + removed == original tokens, per doc
    orig = {r.doc_id: len(_toks(r.text)) for r in corpus.collect()}
    for did, (text, removed) in out.items():
        assert len(_toks(text)) + removed == orig[did]


def test_cut_spans_keeps_other_columns(spark):
    docs = spark.createDataFrame(
        [(1, "en", "tok0 tok1 tok2 tok3")], ["doc_id", "lang", "text"]
    )
    spans = spark.createDataFrame(
        [(1, 2, 3)], "doc_id long, tok_start int, tok_end int"
    )
    row = cut_spans(docs, spans).collect()[0]
    assert (row.lang, row.text, row.n_tokens_removed) == ("en", "tok0 tok3", 2)


def test_no_nested_loop_join_in_plan(corpus):
    plan = dedup_substrings(corpus, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
