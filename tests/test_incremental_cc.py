"""Incremental cluster maintenance (operators/linkage.incremental_components):
folding an edge batch into a converged clustering must be indistinguishable
from re-running connected components over the union graph — the invariant
that makes per-snapshot delta clustering sound at catalog scale."""

import random

from pyspark.sql import functions as F

from polyfuzz_spark.operators.linkage import (
    connected_components,
    incremental_components,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _rows(df):
    return sorted(
        (r.key, r.representative, r.cluster_id)
        for r in df.select("key", "representative", "cluster_id").collect()
    )


def _check_incremental(spark, old_pairs, new_pairs):
    base = connected_components(_edges_df(spark, old_pairs))
    got = incremental_components(base, _edges_df(spark, new_pairs))
    want = connected_components(_edges_df(spark, old_pairs + new_pairs))
    assert _rows(got) == _rows(want)


def test_batch_merges_two_old_clusters(spark):
    # {1,2} and {3,4} converge separately; the batch bridges them and adds 5
    _check_incremental(
        spark, [(1, 2), (3, 4)], [(2, 3), (4, 5)]
    )


def test_batch_of_only_new_nodes(spark):
    _check_incremental(spark, [(1, 2)], [(7, 8), (8, 9)])


def test_batch_inside_one_old_cluster_is_a_noop(spark):
    # contracted edge is a self-loop; assignments must come back unchanged
    _check_incremental(spark, [(1, 2), (2, 3)], [(1, 3)])


def test_empty_batch(spark):
    base = connected_components(_edges_df(spark, [(1, 2), (3, 4)]))
    got = incremental_components(
        base, spark.createDataFrame([], "src string, dst string")
    )
    assert _rows(got) == _rows(base)


def test_chain_of_three_snapshots(spark):
    # maintenance composes: (old + b1) + b2 == full recompute
    old, b1, b2 = [(1, 2), (4, 5)], [(2, 3)], [(3, 4), (9, 1)]
    s1 = incremental_components(
        connected_components(_edges_df(spark, old)), _edges_df(spark, b1)
    )
    s2 = incremental_components(s1, _edges_df(spark, b2))
    want = connected_components(_edges_df(spark, old + b1 + b2))
    assert _rows(s2) == _rows(want)


def test_fuzz_vs_full_recompute(spark):
    rng = random.Random(1234)
    for trial in range(5):
        n = rng.randint(5, 40)
        m = rng.randint(3, 60)
        all_edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        all_edges = [(a, b) for a, b in all_edges if a != b]
        cut = rng.randint(0, len(all_edges))
        _check_incremental(spark, all_edges[:cut], all_edges[cut:])


def test_blocking_quality_exact_values(spark):
    from polyfuzz_spark.metrics import blocking_quality

    pairs = lambda ps: spark.createDataFrame(
        ps, "from_id long, to_id long"
    )
    # 10 records → 45 total pairs; 3 candidates (one reversed duplicate
    # collapses), 4 truth pairs, 2 hits
    cand = pairs([(1, 2), (2, 1), (3, 4), (5, 6)])
    truth = pairs([(1, 2), (3, 4), (7, 8), (9, 1)])
    row = blocking_quality(cand, truth, 10).collect()[0]
    assert row.n_records == 10
    assert row.n_candidate_pairs == 3
    assert row.n_true_pairs == 4
    assert row.n_true_in_candidates == 2
    assert row.reduction_ratio_milli == 933  # (45-3)/45 = 0.9333
    assert row.pairs_completeness_milli == 500
    assert row.pairs_quality_milli == 667


def test_blocking_quality_zero_denominators_yield_null(spark):
    from polyfuzz_spark.metrics import blocking_quality

    empty = spark.createDataFrame([], "from_id long, to_id long")
    row = blocking_quality(empty, empty, 5).collect()[0]
    assert row.n_candidate_pairs == 0 and row.n_true_pairs == 0
    assert row.pairs_completeness_milli is None
    assert row.pairs_quality_milli is None
    assert row.reduction_ratio_milli == 1000


def test_pairwise_f1_prefers_representative_over_digest(spark):
    """A planted cluster_id digest collision across two DISTINCT clusters
    must not count their cross pair as predicted-positive when the
    authoritative rep_doc_id travels with the assignments."""
    from polyfuzz_spark.metrics import pairwise_f1

    cand = spark.createDataFrame([(1, 2)], "from_id long, to_id long")
    labels = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, entity_id string"
    )
    collided = spark.createDataFrame(
        [(1, 777, 1), (2, 777, 2)],  # same digest, different representative
        "doc_id long, cluster_id long, rep_doc_id long",
    )
    res = pairwise_f1(cand, labels, collided)
    assert res["fp"] == 0  # digest-keyed equality would make this 1
    # without the representative the digest is all we have (documented)
    digest_only = collided.select("doc_id", "cluster_id")
    assert pairwise_f1(cand, labels, digest_only)["fp"] == 1


def test_bcubed_exact_values(spark):
    from polyfuzz_spark.metrics import bcubed

    # clusters {1,2,3}, {4,5}; labels A={1,2,4}, B={3,5}
    asg = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 40)],
        "doc_id long, cluster long",
    )
    lab = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "A"), (5, "B")],
        "doc_id long, label string",
    )
    row = bcubed(asg, lab).collect()[0]
    assert row.n_records == 5
    # precision: records 1,2 -> 2/3; 3 -> 1/3; 4 -> 1/2; 5 -> 1/2
    # cell identity with per-cell integer DIV:
    # (4*1e6)//3 + (1*1e6)//3 + (1*1e6)//2 + (1*1e6)//2
    sp = (4 * 10**6) // 3 + (1 * 10**6) // 3 + 10**6 // 2 + 10**6 // 2
    assert row.bcubed_precision_micro == sp // 5
    # recall: cells over label sizes |A|=3, |B|=2
    sr = (4 * 10**6) // 3 + (1 * 10**6) // 2 + (1 * 10**6) // 3 + 10**6 // 2
    assert row.bcubed_recall_micro == sr // 5
    p, r = sp // 5, sr // 5
    assert row.bcubed_f1_micro == (2 * p * r) // (p + r)


def test_bcubed_perfect_clustering_is_one(spark):
    from polyfuzz_spark.metrics import bcubed

    asg = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "doc_id long, cluster long"
    )
    lab = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, label string"
    )
    row = bcubed(asg, lab).collect()[0]
    assert row.bcubed_precision_micro == 1_000_000
    assert row.bcubed_recall_micro == 1_000_000
    assert row.bcubed_f1_micro == 1_000_000


def test_bcubed_empty_input_is_null_not_error(spark):
    """Empty input: n_records = 0 — every ratio must be guarded NULL, not
    a DIVIDE_BY_ZERO under spark.sql.ansi.enabled=true."""
    from polyfuzz_spark.metrics import bcubed

    asg = spark.createDataFrame([], "doc_id long, cluster long")
    lab = spark.createDataFrame([], "doc_id long, label string")
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        row = bcubed(asg, lab).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    # SUM over zero rows is NULL in both engines — n_records stays NULL
    # (not coalesced to 0) to keep twin semantics with the DuckDB oracle
    assert row.n_records is None
    assert row.bcubed_precision_micro is None
    assert row.bcubed_recall_micro is None
    assert row.bcubed_f1_micro is None


def test_bcubed_oracle_twin_empty_input_matches_nulls():
    """The DuckDB SQL twin must mirror metrics.bcubed on the empty edge:
    all-NULL metrics (the pre-fix twin's f1 CASE fell through to ELSE 0
    because NULL > 0 is not true)."""
    import duckdb

    from polyfuzz_spark.queries import ORACLE_BCUBED_EMB

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT CAST(NULL AS BIGINT) AS vec_id, "
        "CAST(NULL AS DOUBLE[]) AS embedding, CAST(NULL AS VARCHAR) AS "
        "label WHERE FALSE"
    )
    n, p, r, f1 = con.execute(ORACLE_BCUBED_EMB).fetchone()
    assert n is None and p is None and r is None and f1 is None


def test_fs_field_stats_exact_counts(spark):
    from polyfuzz_spark.metrics import fs_field_stats

    rows = [
        # (is_match, f1_agrees, f2_agrees)
        (True, True, False),
        (True, True, True),
        (True, False, True),
        (False, True, False),
        (False, False, False),
    ]
    df = spark.createDataFrame(
        rows, "is_match boolean, f1 boolean, f2 boolean"
    )
    out = {
        r.field: r
        for r in fs_field_stats(df, "is_match", ["f1", "f2"]).collect()
    }
    assert out["f1"].n_match == 3 and out["f1"].n_nonmatch == 2
    assert out["f1"].m_milli == 667  # 2/3
    assert out["f1"].u_milli == 500  # 1/2
    assert out["f2"].m_milli == 667
    assert out["f2"].u_milli == 0


def test_fs_field_stats_zero_denominator_is_null(spark):
    from polyfuzz_spark.metrics import fs_field_stats

    df = spark.createDataFrame(
        [(False, True)], "is_match boolean, f1 boolean"
    )
    row = fs_field_stats(df, "is_match", ["f1"]).collect()[0]
    assert row.n_match == 0 and row.m_milli is None
    assert row.u_milli == 1000


def test_ari_known_value_and_bounds(spark):
    from polyfuzz_spark.metrics import adjusted_rand_index

    # [0,0,1,1] vs [a,a,b,c] -> ARI = 4/7 = 0.571428...
    asg = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)], "doc_id long, cluster long"
    )
    lab = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")],
        "doc_id long, label string",
    )
    row = adjusted_rand_index(asg, lab).collect()[0]
    assert row.ari_micro == 571428  # trunc(4/7 * 1e6)

    # perfect agreement -> exactly 1.0
    asg2 = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "doc_id long, cluster long"
    )
    lab2 = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, label string"
    )
    assert adjusted_rand_index(asg2, lab2).collect()[0].ari_micro == 1000000


def test_ari_degenerate_denominator_is_null(spark):
    from polyfuzz_spark.metrics import adjusted_rand_index

    # one cluster AND one label covering everything -> denominator 0
    asg = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, cluster long"
    )
    lab = spark.createDataFrame(
        [(1, "a"), (2, "a")], "doc_id long, label string"
    )
    assert adjusted_rand_index(asg, lab).collect()[0].ari_micro is None


def test_changed_only_upsert_reconstructs_full_state(spark):
    """changed_only emits exactly the upsert set: applying it over the old
    assignments (MERGE INTO semantics) reproduces the full-output mode and
    the from-scratch recompute."""
    import random

    from polyfuzz_spark.operators.linkage import incremental_components

    rng = random.Random(31)
    for trial in range(3):
        n = rng.randint(6, 30)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        cut = rng.randint(1, len(edges) - 1)
        base = connected_components(_edges_df(spark, edges[:cut]))
        batch = _edges_df(spark, edges[cut:])
        full = incremental_components(base, batch)
        ups = incremental_components(base, batch, changed_only=True)
        # every upsert row differs from (or is absent in) the old state
        joined = ups.alias("u").join(
            base.alias("b"), F.col("u.key") == F.col("b.key"), "left"
        )
        assert joined.where(
            F.col("b.representative") == F.col("u.representative")
        ).count() == 0
        # MERGE: old rows not in the upsert set + the upsert set == full
        merged = base.select("key", "representative", "cluster_id").join(
            ups.select("key"), "key", "left_anti"
        ).unionByName(ups)
        assert _rows(merged) == _rows(full)
