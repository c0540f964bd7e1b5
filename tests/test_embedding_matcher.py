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


def _projection_encoder(seed: int = 7, dim: int = 16, calls=None):
    """Nontrivial mock encoder for the K4 plug point: a seeded random
    projection of char-count vectors, applied via mapInPandas (the same
    Arrow-batched shape a real SBERT/Flair backend would use — reference
    ``_embeddings.py:34-60`` constructor plug). Deterministic: same string
    → same embedding, distinct strings → almost surely distinct directions,
    shared prefixes → correlated directions (so cosine ranking is
    meaningful, unlike the hash stub)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((256, dim))

    def encode(df):
        if calls is not None:
            calls.append(1)
        out_cols = df.columns

        def gen(batches):
            for pdf in batches:
                embs = []
                for s in pdf["key"]:
                    counts = np.zeros(256)
                    for ch in (s or ""):
                        counts[ord(ch) % 256] += 1.0
                    v = counts @ proj
                    n = np.sqrt(v @ v)
                    embs.append((v / n if n else v).tolist())
                pdf = pdf.copy()
                pdf["embedding"] = pd.Series(embs, dtype="object")
                yield pdf

        id_t = df.schema["doc_id"].dataType.simpleString()
        return df.mapInPandas(
            gen,
            schema=f"doc_id {id_t}, key string, embedding array<double>",
        ) if out_cols == ["doc_id", "key"] else df.mapInPandas(
            gen,
            schema=", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in df.schema
            ) + ", embedding array<double>",
        )

    return encode


def test_encoder_seam_fit_transform_reuses_fitted_state(spark):
    """K4 plug point end-to-end (reference _embeddings.py:120-133): fit
    encodes BOTH sides; a re_train=False transform encodes only the new
    from-side and matches against the FITTED to-embeddings — the
    production fit/transform split."""
    calls = []
    enc = _projection_encoder(calls=calls)
    m = EmbeddingMatcher(min_similarity=0.0, top_n=1, encoder=enc)

    from polyfuzz_spark.api import lists_to_df

    to_df = lists_to_df(spark, ["apple inc", "mouse pad", "green tea"])
    from_df = lists_to_df(spark, ["aple inc", "mouse pads"])
    fit_out = m.match_df(from_df, to_df).toPandas().set_index("from_key")
    assert len(calls) == 2  # from + to encoded once each
    assert fit_out.loc["aple inc", "to_key"] == "apple inc"
    assert fit_out.loc["mouse pads", "to_key"] == "mouse pad"

    # transform: new queries, re_train=False → only the query side encodes
    q_df = lists_to_df(spark, ["grean tea"])
    t_out = m.match_df(q_df, None, re_train=False).toPandas()
    assert len(calls) == 3  # to-side NOT re-encoded
    assert t_out.loc[0, "to_key"] == "green tea"
    # and this was a two-list match against the fitted corpus, not a
    # self-match: the single query matched something other than itself
    assert len(t_out) == 1

    # re_train=True refreshes the fitted state from the new inputs
    m.match_df(q_df, to_df, re_train=True)
    assert len(calls) == 5


def test_encoder_seam_group_on_bare_strings(spark):
    """group(model=EmbeddingMatcher(encoder=...)) re-matches bare matched
    strings through the encoder — the full K4 lifecycle the reference runs
    with Flair/SBERT backends."""
    from polyfuzz_spark.api import PolyFuzzSpark

    m = PolyFuzzSpark("TF-IDF", spark).match(
        ["apple inc", "aple inc", "mouse pad"],
        ["apple inc", "mouse pad"],
    )
    grouper = EmbeddingMatcher(
        min_similarity=0.0, encoder=_projection_encoder()
    )
    m.group(model=grouper, link_min_similarity=0.5)
    wide = m.matches_pandas()
    assert "Group" in wide.columns
    assert wide.Group.notna().all()


def test_no_nested_loop_join_in_plan(spark, emb_df):
    m = EmbeddingMatcher(min_similarity=0.75, top_n=1)
    df = m.match_df(emb_df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
