"""Multi-format corpus ingestion: parquet / CSV / JSONL all normalize to the
canonical input_hint table with a content-derived doc_id and an enforceable
sha256 lineage column; schema errors surface eagerly."""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.sources.corpus import (
    assert_sha256_invariant,
    generate_corpus,
)
from polyfuzz_spark.sources.ingest import read_corpus


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
    corpus.select(*CANON).write.option("header", "true").option(
        "escape", '"'
    ).option("ignoreLeadingWhiteSpace", "false").option(
        "ignoreTrailingWhiteSpace", "false"
    ).csv(str(tmp_path / "csv"))
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
    """Quotes, commas, newlines (LF and CRLF), backslashes and non-ASCII in
    code content must survive a CSV round-trip byte-for-byte."""
    rows = [
        ("r", f"p{i}", "c", "py", content)
        for i, content in enumerate([
            'print("hello, world")\n  x = 1',
            "a,b,c\r\nd,e",
            'esc \\ backslash and "quoted, with comma"',
            "tab\tand trailing spaces   ",
            "unicode: żółć λ 中文\nsecond line",
            '"leading quote',
        ])
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = str(tmp_path / "adv")
    src.write.option("header", "true").option("escape", '"').option(
        "ignoreLeadingWhiteSpace", "false"
    ).option("ignoreTrailingWhiteSpace", "false").csv(out)
    got = read_corpus(spark, out, "csv")
    assert assert_sha256_invariant(got) == 0
    a = sorted((r["path"], r["content"]) for r in src.collect())
    b = sorted((r["path"], r["content"]) for r in got.collect())
    assert a == b
