"""Sequence packing + chunking (operators/packing.py): hand-computed
positions, straddle semantics, stream completeness, chunk overlap/coverage
invariants, and byte-exact reconstruction from chunks. Cross-engine
exactness is covered by the oracle suite (sequence_packing / code_chunks
in test_queries_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.packing import chunk_text, pack_sequences


def _pack_rows(spark, texts, seq_len, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = pack_sequences(df, seq_len, **kw).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_pack_hand_positions(spark):
    # n_shards=1 → packing order is doc_id; bpe tokens: "a b" = 2,
    # "c d e" = 3, "" = 0, "f g h i" = 4; stream chopped at L=4
    rows = _pack_rows(spark, ["a b", "c d e", "", "f g h i"], 4, n_shards=1)
    assert (rows[0]["seq_id"], rows[0]["seq_offset"], rows[0]["end_seq_id"]) == (
        0, 0, 0,
    )
    # doc 1 starts at offset 2, spans tokens 2..4 → straddles into seq 1
    assert (rows[1]["seq_id"], rows[1]["seq_offset"], rows[1]["end_seq_id"]) == (
        0, 2, 1,
    )
    # empty doc: occupies no tokens; sits at its stream position, no span
    assert (rows[2]["seq_id"], rows[2]["seq_offset"], rows[2]["end_seq_id"]) == (
        1, 1, 1,
    )
    # doc 3: offset 5 → seq 1 pos 1, last token at 8 → seq 2
    assert (rows[3]["seq_id"], rows[3]["seq_offset"], rows[3]["end_seq_id"]) == (
        1, 1, 2,
    )


def test_pack_stream_is_gapless(spark):
    """Across shards, doc positions tile the token stream exactly: total
    stream length == sum of token counts, and per-sequence occupancy never
    exceeds seq_len."""
    texts = [f"tok{i} " * (i % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = pack_sequences(df, 32, n_shards=5).collect()
    starts = sorted(
        (r["seq_id"] * 32 + r["seq_offset"], r["n_tokens"]) for r in out
    )
    pos = 0
    for s, n in starts:
        assert s == pos, f"gap or overlap at stream position {pos} (got {s})"
        pos += n
    assert pos == sum(r["n_tokens"] for r in out)


def test_pack_empty_doc_no_straddle(spark):
    rows = _pack_rows(spark, ["x " * 40, ""], 8, n_shards=1)
    r = rows[1]
    assert r["n_tokens"] == 0
    assert r["end_seq_id"] == r["seq_id"]


def test_pack_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_chunk_coverage_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_text(df, 32, 8).orderBy("chunk_id").collect()
    # grid: starts at 1, stride 24, last chunk clamped to the tail
    assert [r["start_unit"] for r in rows] == [1, 25, 49, 73]
    assert [r["end_unit"] for r in rows] == [32, 56, 80, 100]
    # consecutive chunks share exactly `overlap` units
    for a, b in zip(rows, rows[1:]):
        assert a["end_unit"] - b["start_unit"] + 1 == 8
    # full coverage, no unit skipped
    assert rows[-1]["end_unit"] == 100


def test_chunk_reconstruction_exact(spark):
    """Dropping each chunk's first `overlap` units (except chunk 0) and
    concatenating reproduces the original document byte-for-byte —
    verified via sha equality against Spark-side reconstruction."""
    text = "\n".join(f"line {i}: body" for i in range(23))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = (
        chunk_text(df, 5, 2, unit="line").orderBy("chunk_id").collect()
    )
    lines = text.split("\n")
    rebuilt = []
    for r in rows:
        seg = lines[r["start_unit"] - 1 : r["end_unit"]]
        rebuilt.extend(seg if not rebuilt else seg[2:])
    assert "\n".join(rebuilt) == text
    # chunk shas match locally computed shas
    import hashlib

    for r in rows:
        seg = "\n".join(lines[r["start_unit"] - 1 : r["end_unit"]])
        assert r["chunk_sha256"] == hashlib.sha256(seg.encode()).hexdigest()


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], ["doc_id", "text"]
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_text(df, 32, 8).collect()
    }
    assert set(rows) == {(1, 0), (2, 0)}
    assert rows[(1, 0)]["n_chunk_units"] == 3
    # empty string splits to one empty unit in both engines
    assert rows[(2, 0)]["n_chunk_units"] == 1


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text(df, 8, 8)
