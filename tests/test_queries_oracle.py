"""Driver-contract conformance: every queries() entry runs, and every
oracle_sql() twin produces the identical canonical table (the same compare
the driver performs: sorted columns, sorted rows, exact values).

Runs at sf0.001 for speed; the driver runs the same pairs at sf0.01 (also
validated manually — see .claude/skills/verify/SKILL.md)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_con

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    # approximate/composite ops are deliberately rows-only (simhash gained
    # an exact oracle once its term hash moved to md5 — DuckDB's md5 is
    # bit-identical)
    assert set(QUERIES) - set(ORACLES) == {
        "embedding_knn_lsh", "embedding_knn_ivf", "wratio_top1",
        # iterative argmax loop — no SQL twin; counting machinery exact
        # via bpe_pair_counts, loop golden/property-tested (test_bpe.py)
        "bpe_merges",
    }


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    got = QUERIES[name](spark, SF)
    exp = con.execute(ORACLES[name]).df()
    ok, msg = compare(got, exp)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.columns) >= 2


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"from_id", "from_key", "to_id", "to_key", "similarity", "group"} <= set(
        df.columns
    )


@pytest.mark.parametrize("ann", ["embedding_knn_lsh", "embedding_knn_ivf"])
def test_ann_recall_vs_exact(spark, ann):
    """Every approximate ANN variant must agree with brute force on most
    top-1s."""
    exact = QUERIES["embedding_cosine_top3"](spark, SF).toPandas()
    approx = QUERIES[ann](spark, SF).toPandas()
    e1 = exact[exact.rnk == 1].set_index("query_id").neighbor_id
    a1 = approx[approx["rank"] == 1].set_index("query_id").neighbor_id
    joined = e1.to_frame("e").join(a1.to_frame("a"), how="left")
    recall = (joined.e == joined.a).mean()
    assert recall >= 0.6, f"{ann}: {recall}"
