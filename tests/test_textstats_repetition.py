"""Repetition-signal scalars (Gopher-rules family): Spark expression vs the
DuckDB SQL twin on adversarial synthetic text — the contract `documents`
table is single-line, so the line-level signal is exercised here."""

import duckdb
import pytest

from polyfuzz_spark.functions import textstats as TS

CASES = [
    "a\nb\na\na",          # 2 dup lines of 4 -> 500
    "x",                    # single line -> 0
    "",                     # empty -> 0
    "l1\nl1\nl1\nl1",      # 3 dup of 4 -> 750
    "a\n\n\na",            # empty lines dedupe together -> 500
    "  spaced   out\ttabs\nand  more ",
    "tok tok tok tok",
    "unique words only here",
]


def _duck_lit(t: str) -> str:
    return "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


@pytest.mark.parametrize(
    "fn,sql_fn",
    [
        (TS.dup_line_frac_milli, TS.dup_line_frac_milli_sql),
        (TS.dup_token_frac_milli, TS.dup_token_frac_milli_sql),
    ],
    ids=["dup_line", "dup_token"],
)
def test_scalar_matches_duckdb_twin(spark, fn, sql_fn):
    df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(CASES)], "text string, id int"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", fn("text").alias("m")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        exp = con.execute("SELECT " + sql_fn(_duck_lit(t))).fetchone()[0]
        assert got[i] == exp, (t, got[i], exp)


def test_tokens_drop_empty_and_split_on_any_whitespace(spark):
    df = spark.createDataFrame([("  a \t b\nc  ",)], "text string")
    row = df.select(TS.tokens("text").alias("t")).collect()[0]
    assert row["t"] == ["a", "b", "c"]


def test_token_sort_key_matches_duckdb_twin(spark):
    cases = [
        "b a c",
        "Zebra apple Banana",          # binary sort: uppercase before lower
        "  padded \t with\nwhitespace ",
        "déjà vu déjà",                # non-ASCII codepoints
        "same same same",
        "",
    ]
    df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(cases)], "text string, id int"
    )
    got = {
        r["id"]: r["k"]
        for r in df.select("id", TS.token_sort_key("text").alias("k")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(cases):
        exp = con.execute(
            "SELECT " + TS.token_sort_key_sql(_duck_lit(t))
        ).fetchone()[0]
        assert got[i] == exp, (t, got[i], exp)
