"""Unit behavior of identifier canonicalization (functions/identifiers.py):
casing-convention round-trips, acronym/digit boundaries, and Spark/DuckDB
twin equality on adversarial names. The contract query + oracle are
covered by test_queries_oracle.py."""

import duckdb
import pytest

from polyfuzz_spark.functions.identifiers import (
    identifier_norm,
    identifier_norm_sql,
    identifier_tokens,
    identifier_tokens_sql,
)

CASES = [
    "parseHTTPResponse",
    "parse_http_response",
    "parse-http-response",
    "Parse.Http.Response",
    "HTTPServer",
    "v2Parser",
    "getX",
    "snake_case_with_many_parts",
    "ALLCAPS",
    "mixed_Snake-and.dotsAndCamel",
    "__dunder__init__",
    "trailing_",
    "a",
    "",
    "   ",
]


def _duck_lit(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


@pytest.fixture(scope="module")
def normed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id int, ident string"
    )
    out = df.select(
        "id",
        identifier_norm("ident").alias("n"),
        identifier_tokens("ident").alias("tk"),
    )
    return {r.id: r for r in out.collect()}


def test_conventions_converge(normed):
    # the four spellings of one entity canonicalize identically
    assert (
        normed[0].n == normed[1].n == normed[2].n == normed[3].n
        == "parse http response"
    )


def test_boundaries(normed):
    assert normed[4].n == "http server"       # acronym + Word
    assert normed[5].n == "v2 parser"         # digit before Upper
    assert normed[6].n == "get x"
    assert normed[8].n == "allcaps"           # pure acronym: one token
    assert normed[9].n == "mixed snake and dots and camel"


def test_edges(normed):
    assert normed[10].n == "dunder init"      # leading/trailing separators
    assert normed[11].n == "trailing"
    assert normed[12].n == "a"
    assert normed[13].n == "" and normed[13].tk == []
    assert normed[14].n == ""                 # blank input stays empty


def test_tokens_match_norm(normed):
    for r in normed.values():
        assert list(r.tk) == (r.n.split(" ") if r.n else [])


def test_twin_equality_on_adversarial_names(normed):
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        lit = _duck_lit(t)
        n, tk = con.sql(
            f"SELECT {identifier_norm_sql(lit)}, {identifier_tokens_sql(lit)}"
        ).fetchone()
        assert n == normed[i].n, (i, t)
        assert list(tk) == list(normed[i].tk), (i, t)
