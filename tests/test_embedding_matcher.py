"""EmbeddingMatcher semantics + plan shape.

Reference semantics (``/root/reference/polyfuzz/models/_embeddings.py:94-145``,
``docs/releases.md:95-118``): L2-normalize then cosine; single list →
self-matches excluded; two identical lists → self-matches kept (score 1);
sub-threshold → To=None/0.0. The matcher must route through the dense top-k
kernel — never the BroadcastNestedLoopJoin the old non-equi self-join
planned (VERDICT r01 item 2)."""

import contextlib
import io

import pytest

from polyfuzz_spark.matchers import EmbeddingMatcher


@pytest.fixture(scope="module")
def emb_df(spark):
    # unit-normable vectors with hand-computable cosines:
    # cos(0,1)=1, cos(2,3)=0.8, cos(0,3)=0.6, cos(0,2)=0
    rows = [
        (0, "a", [1.0, 0.0]),
        (1, "b", [2.0, 0.0]),
        (2, "c", [0.0, 1.0]),
        (3, "d", [0.6, 0.8]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, key string, embedding array<double>"
    )


def test_selfmatch_excludes_diagonal_and_scores(spark, emb_df):
    m = EmbeddingMatcher(min_similarity=0.75, top_n=1)
    out = m.match_df(emb_df).toPandas().set_index("from_id").sort_index()
    assert out.loc[0, "to_id"] == 1 and out.loc[0, "similarity"] == 1.0
    assert out.loc[1, "to_id"] == 0 and out.loc[1, "similarity"] == 1.0
    assert out.loc[2, "to_id"] == 3 and out.loc[2, "similarity"] == 0.8
    assert out.loc[3, "to_id"] == 2 and out.loc[3, "similarity"] == 0.8


def test_threshold_nulls_below_min_similarity(spark, emb_df):
    m = EmbeddingMatcher(min_similarity=0.9, top_n=1)
    out = m.match_df(emb_df).toPandas().set_index("from_id").sort_index()
    assert out.loc[0, "to_id"] == 1
    assert out.loc[2, "to_id"] is None or out.loc[2, "to_id"] != out.loc[2, "to_id"]
    assert out.loc[2, "similarity"] == 0.0


def test_identical_two_lists_keep_self_matches(spark, emb_df):
    m = EmbeddingMatcher(min_similarity=0.75, top_n=1)
    out = m.match_df(emb_df, emb_df).toPandas().set_index("from_id")
    # two explicit lists: every vector's best match is itself (score 1);
    # 0 and 1 are colinear (cos=1) so the deterministic to_id-asc tie-break
    # sends both to id 0 — ids with a unique direction match themselves
    assert (out.loc[[0, 1], "similarity"] == 1.0).all()
    assert (out.loc[[0, 1], "to_id"] == 0).all()
    assert out.loc[2, "to_id"] == 2 and out.loc[2, "similarity"] == 1.0
    assert out.loc[3, "to_id"] == 3 and out.loc[3, "similarity"] == 1.0


def test_no_nested_loop_join_in_plan(spark, emb_df):
    m = EmbeddingMatcher(min_similarity=0.75, top_n=1)
    df = m.match_df(emb_df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
