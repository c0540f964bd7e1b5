"""The labeled-pair evaluation verb: api.score_pairs scores EXPLICIT pairs
with an edit-distance kernel or a pair-corpus-fitted TF-IDF model.

Oracles: DuckDB levenshtein for the kernel path; the same TF-IDF CTE chain
the contract queries use (queries._tfidf_oracle_cte) over a VALUES-backed
documents table for the TF-IDF path — exact at milli precision.
"""

from __future__ import annotations

import duckdb
import pytest

from polyfuzz_spark.api import score_pairs

PAIRS = [
    ("apple", "apples"),
    ("appl", "apple"),
    ("house", "mouse"),
    ("recal", "similarity"),
    ("apple", "apple"),   # self pair → 1.0 on every scorer
    ("ab", "apple"),      # gram-less under (3,3) after cleaning → TF-IDF 0
    ("apples", "apple"),  # reversed orientation of row 0
]


def _pairs_df(spark):
    return spark.createDataFrame(PAIRS, "key_a string, key_b string")


def test_score_pairs_tfidf_matches_duckdb(spark):
    got = {
        (r["key_a"], r["key_b"]): r["similarity"]
        for r in score_pairs(_pairs_df(spark), "TF-IDF").collect()
    }
    assert len(got) == len(PAIRS)

    con = duckdb.connect()
    distinct = sorted({s for p in PAIRS for s in p})
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(distinct))
    )
    from polyfuzz_spark.queries import _tfidf_oracle_cte

    sql = f"""
WITH {_tfidf_oracle_cte(0.0)}
SELECT da.text AS a, db.text AS b,
       round(sum(va.weight * vb.weight), 3) AS sim
FROM vec va JOIN vec vb ON va.term = vb.term
JOIN documents da ON va.id = da.doc_id
JOIN documents db ON vb.id = db.doc_id
GROUP BY 1, 2
"""
    exp = {
        (r[0], r[1]): r[2] for r in con.execute(sql).fetchall()
    }
    for a, b in PAIRS:
        want = exp.get((a, b), 0.0)
        assert got[(a, b)] == pytest.approx(want, abs=1e-9), (a, b)
    # orientation symmetry and the documented edge cases
    assert got[("apple", "apples")] == got[("apples", "apple")]
    assert got[("apple", "apple")] == 1.0
    assert got[("ab", "apple")] == 0.0


def test_score_pairs_levenshtein_matches_duckdb(spark):
    got = {
        (r["key_a"], r["key_b"]): r["similarity"]
        for r in score_pairs(_pairs_df(spark), "levenshtein_sim").collect()
    }
    con = duckdb.connect()
    for a, b in PAIRS:
        lev = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        want = round(1.0 - lev / max(len(a), len(b)), 3)
        assert got[(a, b)] == pytest.approx(want, abs=1e-9), (a, b)


def test_score_pairs_wratio_bounds(spark):
    rows = score_pairs(_pairs_df(spark), "WRatio").collect()
    for r in rows:
        assert 0.0 <= r["similarity"] <= 1.0
        if r["key_a"] == r["key_b"]:
            assert r["similarity"] == 1.0


def test_score_pairs_rejects_unknown_scorer(spark):
    with pytest.raises(ValueError, match="unknown scorer kernel"):
        score_pairs(_pairs_df(spark), "nope")
