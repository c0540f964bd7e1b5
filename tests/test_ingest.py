"""Multi-format corpus ingestion: parquet / CSV / JSONL all normalize to the
canonical input_hint table with a content-derived doc_id and an enforceable
sha256 lineage column; schema errors surface eagerly."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.sources.corpus import (
    assert_sha256_invariant,
    generate_corpus,
)
from polyfuzz_spark.sources.ingest import CSV_WRITE_OPTS, read_corpus


def _write_csv(df, path):
    w = df.write
    for k, v in CSV_WRITE_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, 50).cache()


CANON = ["doc_id", "repo", "path", "commit", "lang", "content",
         "content_sha256"]


def _canon_rows(df):
    return sorted(
        tuple(r) for r in df.select(*CANON).collect()
    )


def test_roundtrip_parquet_csv_jsonl_identical(spark, corpus, tmp_path):
    base = _canon_rows(corpus)
    corpus.select(*CANON).write.parquet(str(tmp_path / "pq"))
    _write_csv(corpus.select(*CANON), str(tmp_path / "csv"))
    corpus.select(*CANON).write.json(str(tmp_path / "jsonl"))

    for fmt, path in [("parquet", "pq"), ("csv", "csv"), ("json", "jsonl")]:
        got = read_corpus(spark, str(tmp_path / path), fmt)
        assert got.columns == CANON, fmt
        assert _canon_rows(got) == base, f"{fmt} round-trip differs"
        assert assert_sha256_invariant(got) == 0, fmt


def test_derives_doc_id_and_sha_when_absent(spark, corpus, tmp_path):
    src = corpus.select("repo", "path", "commit", "lang", "content")
    src.write.json(str(tmp_path / "bare"))
    got = read_corpus(spark, str(tmp_path / "bare"), "json")
    assert assert_sha256_invariant(got) == 0
    # content-derived id: deterministic and collision-free on this corpus
    assert got.select("doc_id").distinct().count() == got.count()
    again = read_corpus(spark, str(tmp_path / "bare"), "json")
    assert _canon_rows(got) == _canon_rows(again)


def test_missing_columns_raise_eagerly(spark, corpus, tmp_path):
    corpus.select("repo", "content").write.parquet(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(spark, str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="unsupported corpus format"):
        read_corpus(spark, str(tmp_path / "bad"), "orc2")


def test_csv_roundtrip_survives_adversarial_content(spark, tmp_path):
    """Quotes, commas, newlines (LF and CRLF), backslashes, non-ASCII AND
    the empty string (ADVICE r02: default CSV options mapped '' back to
    null, nulling the sha256 lineage of empty documents) must survive a
    CSV round-trip byte-for-byte."""
    rows = [
        ("r", f"p{i}", "c", "py", content)
        for i, content in enumerate([
            'print("hello, world")\n  x = 1',
            "a,b,c\r\nd,e",
            'esc \\ backslash and "quoted, with comma"',
            "tab\tand trailing spaces   ",
            "unicode: żółć λ 中文\nsecond line",
            '"leading quote',
            "",                       # empty document
        ])
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = str(tmp_path / "adv")
    _write_csv(src, out)
    got = read_corpus(spark, out, "csv")
    assert assert_sha256_invariant(got) == 0
    a = sorted((r["path"], r["content"]) for r in src.collect())
    b = sorted((r["path"], r["content"]) for r in got.collect())
    assert a == b
    # the empty document keeps a non-null sha (sha2('') is defined)
    empty = got.where(F.col("content") == "").select("content_sha256").collect()
    assert len(empty) == 1 and empty[0][0] is not None


def test_csv_null_sentinel_collision_is_the_documented_one(spark, tmp_path):
    """CSV cannot represent NULL distinctly from every possible string: the
    engine uses the de-facto ``\\N`` convention (MySQL LOAD DATA / Hive),
    so NULL content round-trips as NULL, and literal backslash-N content —
    the ONE sentinel collision — reads back as NULL too. Pinned here so
    the tradeoff stays visible; exporters with literal ``\\N`` payloads
    should ship parquet/JSONL instead."""
    src = spark.createDataFrame(
        [("r", "null_row", "c", "py", None), ("r", "bsn_row", "c", "py", "\\N")],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path / "nulls")
    _write_csv(src, out)
    got = {r["path"]: r["content"] for r in read_corpus(spark, out, "csv").collect()}
    assert got == {"null_row": None, "bsn_row": None}


def test_jsonl_explicit_schema_no_type_drift(spark, tmp_path):
    """JSONL ingestion must NOT run full-scan schema inference: an exporter
    writing numeric-looking repo/path/commit values yields the same string
    columns (and therefore the same xxhash64 doc_ids) as CSV/parquet reads
    of the same data (ADVICE r02)."""
    import os

    p = str(tmp_path / "numericish")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write('{"repo": 42, "path": 7, "commit": 123456, "lang": "py", '
                '"content": "x = 1"}\n')
        f.write('{"repo": "r2", "path": "src/b.py", "commit": "c1", '
                '"lang": "py", "content": ""}\n')
    got = read_corpus(spark, p, "json")
    rows = {r["repo"]: r for r in got.collect()}
    assert set(rows) == {"42", "r2"}          # strings, not bigints
    assert rows["42"]["commit"] == "123456"
    # same doc_id as the equivalent all-string source (parquet twin)
    twin = spark.createDataFrame(
        [("42", "7", "123456", "py", "x = 1")],
        "repo string, path string, commit string, lang string, content string",
    )
    tp = str(tmp_path / "twin")
    twin.write.parquet(tp)
    want = read_corpus(spark, tp, "parquet").collect()[0]["doc_id"]
    assert rows["42"]["doc_id"] == want
    # empty content keeps a non-null sha
    assert rows["r2"]["content"] == "" and rows["r2"]["content_sha256"]


def test_jsonl_quoted_doc_id_survives(spark, tmp_path):
    """A quoted doc_id must not null out under the explicit schema (the
    sampled value's type drives the field type; the canonical projection
    casts to long)."""
    import os

    p = str(tmp_path / "quotedid")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write('{"doc_id": "77", "repo": "r", "path": "a", "commit": "c", '
                '"lang": "py", "content": "x"}\n')
    got = read_corpus(spark, p, "json").collect()
    assert got[0]["doc_id"] == 77


def test_jsonl_missing_required_raises_at_peek(spark, tmp_path):
    import os

    p = str(tmp_path / "badjson")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write('{"repo": "r", "content": "x"}\n')
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(spark, p, "json")
