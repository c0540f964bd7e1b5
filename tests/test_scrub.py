"""Unit behavior of the PII scrub (functions/scrub.py): replacement order
(URL before email before IP), counts on progressively-scrubbed text, and
Spark/DuckDB twin equality on adversarial strings. The contract query +
oracle are covered by test_queries_oracle.py."""

import duckdb
import pytest

from polyfuzz_spark.functions.scrub import (
    PATTERNS,
    pii_count,
    pii_count_sql,
    scrub_text,
    scrub_text_sql,
)

CASES = [
    "mail me at a.b-c+x@sub.example.org today",
    "fetch https://example.com/path?q=1&r=2#frag then stop",
    "plain http://ex.io and email user@ex.io and ip 192.168.0.255 mix",
    # email-looking text inside a URL must scrub as the URL, not the email
    "see https://host.io/u@v.com/page now",
    "no pii here at all",
    "edge 999.999.999.999 still matches the liberal ipv4 shape",
    "",
]


def _duck_lit(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id int, text string"
    )
    out = df.select(
        "id",
        scrub_text("text").alias("s"),
        *[pii_count("text", k).alias(f"n_{k}") for k, _, _ in PATTERNS],
    )
    return {r.id: r for r in out.collect()}


def test_url_wins_over_embedded_email(scrubbed):
    r = scrubbed[3]
    assert r.s == "see <URL> now"
    assert r.n_url == 1 and r.n_email == 0


def test_mixed_line_counts_each_kind_once(scrubbed):
    r = scrubbed[2]
    assert r.s == "plain <URL> and email <EMAIL> and ip <IP> mix"
    assert (r.n_url, r.n_email, r.n_ip) == (1, 1, 1)


def test_clean_text_untouched(scrubbed):
    assert scrubbed[4].s == CASES[4]
    assert scrubbed[6].s == ""
    for r in (scrubbed[4], scrubbed[6]):
        assert (r.n_url, r.n_email, r.n_ip) == (0, 0, 0)


def test_spark_matches_duckdb_twin(scrubbed):
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        lit = _duck_lit(t)
        exprs = [scrub_text_sql(lit)] + [
            pii_count_sql(lit, k) for k, _, _ in PATTERNS
        ]
        exp = con.execute("SELECT " + ", ".join(exprs)).fetchone()
        r = scrubbed[i]
        got = (r.s, r.n_url, r.n_email, r.n_ip)
        assert got == exp, (t, got, exp)


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        pii_count("text", "ssn")
    with pytest.raises(ValueError):
        pii_count_sql("text", "ssn")
