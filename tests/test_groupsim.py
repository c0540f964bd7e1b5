"""Group-level Jaccard (fork/clone detection) — operators/groupsim.py.

Planted repos with known overlap; every number below is hand-computed.
"""

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.groupsim import fork_groups, group_jaccard_pairs


@pytest.fixture(scope="module")
def items(spark):
    # repoA: f1 f2 f3 f4 ; repoB: f1 f2 f3 ; repoC: g1 g2 ; repoD == repoA
    rows = [
        ("repoA", x) for x in ["f1", "f2", "f3", "f4"]
    ] + [
        ("repoB", x) for x in ["f1", "f2", "f3"]
    ] + [
        ("repoC", x) for x in ["g1", "g2"]
    ] + [
        ("repoD", x) for x in ["f1", "f2", "f3", "f4"]
    ]
    # duplicate (group, item) rows must NOT inflate similarity
    rows += [("repoA", "f1"), ("repoB", "f3")]
    return spark.createDataFrame(rows, "group_key string, item_key string")


def _pairs_dict(df):
    return {
        (r["group_a"], r["group_b"]): (
            r["shared"], r["n_a"], r["n_b"], r["jacc_milli"]
        )
        for r in df.collect()
    }


def test_planted_jaccard_values(items):
    got = _pairs_dict(group_jaccard_pairs(items))
    # A∩B = 3, |A|=4 |B|=3 → 3/4 → 750 milli (integer div)
    assert got[("repoA", "repoB")] == (3, 4, 3, 750)
    # A == D → 1000
    assert got[("repoA", "repoD")] == (4, 4, 4, 1000)
    assert got[("repoB", "repoD")] == (3, 3, 4, 750)
    # C shares nothing → absent entirely (min_shared=1)
    assert not any("repoC" in k for k in got)
    assert len(got) == 3


def test_min_jaccard_and_min_shared_filters(items):
    assert set(_pairs_dict(
        group_jaccard_pairs(items, min_jaccard_milli=800)
    )) == {("repoA", "repoD")}
    assert set(_pairs_dict(
        group_jaccard_pairs(items, min_shared=4)
    )) == {("repoA", "repoD")}


def test_max_df_drops_boilerplate_items(spark, items):
    # plant a LICENSE-like item present in every repo: without a cut it
    # would link repoC to everything; max_df=3 removes it (df=4 > 3) and
    # sizes are recomputed over the retained universe (planted values
    # unchanged)
    lic = spark.createDataFrame(
        [(g, "LICENSE") for g in ["repoA", "repoB", "repoC", "repoD"]],
        "group_key string, item_key string",
    )
    got = _pairs_dict(group_jaccard_pairs(items.union(lic), max_df=3))
    assert got[("repoA", "repoB")] == (3, 4, 3, 750)
    assert not any("repoC" in k for k in got)
    # without the cut, LICENSE links repoC to all three others
    loose = _pairs_dict(group_jaccard_pairs(items.union(lic)))
    assert sum("repoC" in k[0] or "repoC" in k[1] for k in loose) == 3


def test_fork_families_and_singletons(items):
    pairs = group_jaccard_pairs(items)
    fams = {
        r["group_key"]: r["fork_rep"]
        for r in fork_groups(pairs, items, fork_min_milli=800).collect()
    }
    # only A-D is a fork edge at ≥0.8; B and C are their own reps
    assert fams == {
        "repoA": "repoA", "repoD": "repoA",
        "repoB": "repoB", "repoC": "repoC",
    }


def test_null_items_ignored(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", "x"), ("b", None)],
        "group_key string, item_key string",
    )
    got = _pairs_dict(group_jaccard_pairs(df))
    # nulls are not items: |a|=|b|=1, shared=1 → 1000
    assert got == {("a", "b"): (1, 1, 1, 1000)}
