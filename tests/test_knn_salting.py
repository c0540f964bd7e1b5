"""Grid-salting exactness for the per-bucket ANN kernel: query lanes and
member lanes must be invisible in the output — same rows as the unsalted
run, and a fully degenerate bucket (IVF n_cells=1) must reproduce exact
brute force even when shredded across member lanes."""

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos_milli"])
        for r in df.collect()
    )


def test_degenerate_single_cell_with_member_salt_is_exact(spark, embs):
    """n_cells=1 puts the WHOLE corpus in one bucket — the hot-bucket worst
    case. member_salt=4 shreds it across lanes; the result must still be
    the exact brute-force top-3."""
    from polyfuzz_spark.operators.knn import cosine_topk, ivf_cosine_topk

    exact = _rows(cosine_topk(embs, embs, k=3, exclude_self=True))
    salted = _rows(
        ivf_cosine_topk(
            embs, embs, k=3, n_cells=1, n_probe=1,
            exclude_self=True, member_salt=4,
        )
    )
    assert salted == exact


def test_compact_float32_agrees_with_float64_on_top1(spark, embs):
    """compact=True (float32 bucket shuffle + kernel) may flip milli
    rounding at .0005 boundaries but must agree with the float64 path on
    nearly every top-1 — the contract that justifies using it on the
    rows-only scale paths."""
    from polyfuzz_spark.operators.knn import ivf_cosine_topk

    kw = dict(k=1, n_cells=8, n_probe=8, exclude_self=True)
    f64 = {r["query_id"]: r["neighbor_id"]
           for r in ivf_cosine_topk(embs, embs, **kw).collect()}
    f32 = {r["query_id"]: r["neighbor_id"]
           for r in ivf_cosine_topk(embs, embs, compact=True, **kw).collect()}
    agree = sum(f64[q] == f32.get(q) for q in f64) / len(f64)
    assert agree >= 0.98, agree


def test_lsh_member_salt_is_output_invisible(spark, embs):
    from polyfuzz_spark.operators.knn import lsh_cosine_topk

    base = _rows(
        lsh_cosine_topk(
            embs, embs, k=3, dim=64, n_planes=4, n_tables=6,
            exclude_self=True,
        )
    )
    salted = _rows(
        lsh_cosine_topk(
            embs, embs, k=3, dim=64, n_planes=4, n_tables=6,
            exclude_self=True, member_salt=3,
        )
    )
    assert salted == base
