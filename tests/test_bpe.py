"""Distributed BPE tokenizer training (operators/bpe.py): the Sennrich
golden corpus, a property fuzz against an independent pure-Python
reference, encoding semantics, and the bounded-driver-tier contract.
The distributed counting step's cross-engine twin is covered by the
oracle suite (bpe_pair_counts)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.bpe import (
    EOW,
    bpe_encode,
    learn_bpe,
    pair_counts_df,
    word_counts,
)

# the classic corpus from Sennrich et al. 2016 §3.2 (word: frequency)
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent reference: textbook BPE with the same deterministic
    tie-break, written against dict-of-lists (not tuples) so a shared bug
    with the implementation under test is unlikely."""
    vocab = [(list(w) + [EOW], c) for w, c in sorted(word_freqs.items())]
    out = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), cnt = best
        out.append((a, b, cnt))
        nxt = []
        for syms, c in vocab:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nxt.append((res, c))
        vocab = nxt
    return out


def _wc_df(spark, word_freqs):
    rows = [(w, int(c)) for w, c in word_freqs.items()]
    return spark.createDataFrame(rows, "word string, cnt bigint")


def test_sennrich_golden_first_merges(spark):
    merges = learn_bpe(_wc_df(spark, SENNRICH), 4).collect()
    got = [(r["left"], r["right"], r["pair_count"]) for r in merges]
    # e+s appears in newest(6)+widest(3) = 9 — the paper's first merge
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", EOW, 9)
    assert got[3] == ("l", "o", 7)  # low(5) + lower(2)


def test_matches_independent_reference(spark):
    corpora = [
        SENNRICH,
        {"aaaa": 3, "aab": 2, "ba": 7},          # overlapping-pair greed
        {"x": 1},                                  # single char + EOW only
        {"ab": 1, "abab": 1, "ababab": 1},
        {"mississippi": 4, "missive": 2, "ss": 9},
    ]
    for wf in corpora:
        merges = learn_bpe(_wc_df(spark, wf), 8).collect()
        got = [(r["left"], r["right"], r["pair_count"]) for r in merges]
        assert got == _ref_bpe(wf, 8), wf


def test_word_counts_and_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab")], ["doc_id", "text"]
    )
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert wc == {"ab": 3, "cd": 1}
    pc = {
        (r["lhs"], r["rhs"]): r["cnt"]
        for r in pair_counts_df(word_counts(docs)).collect()
    }
    # ab×3 → (a,b)=3, (b,EOW)=3; cd×1 → (c,d)=1, (d,EOW)=1
    assert pc == {("a", "b"): 3, ("b", EOW): 3, ("c", "d"): 1, ("d", EOW): 1}
    # min_count floor applies post-agg
    wc2 = {r["word"]: r["cnt"] for r in word_counts(docs, min_count=2).collect()}
    assert wc2 == {"ab": 3}


def test_encode_golden(spark):
    merges = learn_bpe(_wc_df(spark, SENNRICH), 10)
    docs = spark.createDataFrame(
        [(1, "lowest low"), (2, "newest"), (3, "zzz")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"], r["bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    # "lowest": low + est</w> after 10 merges learn both units
    assert "est" + EOW in out[1][2]
    assert out[1][0] == 2
    assert out[2][2] == ["newest" + EOW]
    # unseen chars fall back to char-level pieces, nothing is dropped
    assert out[3][2] == ["z", "z", "z", EOW]
    assert out[3][1] == 4


def test_encode_merge_priority_is_rank_order(spark):
    # ranks: (a,b) first, then (ab,c). Encoding "abc" must apply the
    # LOWEST rank first even though (b,c) never merges
    merges = spark.createDataFrame(
        [(0, "a", "b", "ab", 10), (1, "ab", "c", "abc", 5)],
        "rank int, left string, right string, merged string, pair_count bigint",
    )
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    (row,) = bpe_encode(docs, merges).collect()
    assert row["bpe_tokens"] == ["abc", EOW]


def test_encode_counts_join_route_matches_encode(spark):
    from polyfuzz_spark.operators.bpe import bpe_encode_counts

    merges = learn_bpe(_wc_df(spark, SENNRICH), 10)
    docs = spark.createDataFrame(
        [(1, "lowest low low"), (2, "newest widest"), (3, "zzz qq")],
        ["doc_id", "text"],
    )
    via_join = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(docs, merges).collect()
    }
    via_memo = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    assert via_join == via_memo
    assert via_join[1][0] == 3


def test_encode_string_ids(spark):
    merges = learn_bpe(_wc_df(spark, {"ab": 2}), 1)
    docs = spark.createDataFrame([("d1", "ab")], ["doc_id", "text"])
    (row,) = bpe_encode(docs, merges).collect()
    assert row["doc_id"] == "d1" and row["n_bpe_tokens"] >= 1


def test_driver_tier_refuses_then_truncates(spark):
    wf = {f"w{i}": 1 for i in range(50)}
    with pytest.raises(ValueError, match="max_words"):
        learn_bpe(_wc_df(spark, wf), 2, max_words=10)
    got = learn_bpe(_wc_df(spark, wf), 2, max_words=10, allow_truncate=True)
    assert got.count() == 2


def test_empty_and_exhausted_corpora(spark):
    empty = spark.createDataFrame([], "word string, cnt bigint")
    assert learn_bpe(empty, 5).count() == 0
    # single 1-char word exhausts after 1 merge (char + EOW)
    got = learn_bpe(_wc_df(spark, {"a": 3}), 5).collect()
    assert [(r["left"], r["right"]) for r in got] == [("a", EOW)]


def test_merge_word_counts_equals_joint_and_same_merges(spark):
    """Halves-merge == joint fit for the tokenizer: identical word counts
    AND an identical learned merge sequence (the incremental-evolution
    contract shared with merge_hashed_lms / merge_tfidf_models)."""
    import random

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.bpe import (
        learn_bpe,
        merge_word_counts,
        word_counts,
    )

    rng = random.Random(5)
    vocab = ["river", "rivet", "driver", "banana", "bandana", "ban"]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 5))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)

    joint = word_counts(docs)
    merged = merge_word_counts(word_counts(a), word_counts(b))
    assert sorted(map(tuple, joint.collect())) == sorted(
        map(tuple, merged.collect())
    )
    mj = [tuple(r) for r in learn_bpe(joint, 8).collect()]
    mm = [tuple(r) for r in learn_bpe(merged, 8).collect()]
    assert mj == mm


def test_merge_word_counts_floor_applies_after_sum(spark):
    from polyfuzz_spark.operators.bpe import merge_word_counts

    a = spark.createDataFrame([("x", 2), ("y", 1)], "word string, cnt long")
    b = spark.createDataFrame([("x", 1), ("y", 1)], "word string, cnt long")
    out = {r.word: r.cnt for r in merge_word_counts(a, b, min_count=3).collect()}
    # y = 1+1 = 2 < 3 drops; x = 3 clears the floor only thanks to the sum
    assert out == {"x": 3}
