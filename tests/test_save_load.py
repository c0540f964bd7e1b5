"""S4/S5 — model persistence round-trip (reference polyfuzz.py:429-457
joblib pickle → parquet + JSON manifest here): a loaded instance must
transform() identically to the fitted one without refitting."""

import pandas as pd

from polyfuzz_spark.api import PolyFuzzSpark
from polyfuzz_spark.operators.tfidf import fit_tfidf, load_model, save_model


def _canon(df):
    return (
        df.toPandas()
        .sort_values(["from_id", "rank"])
        .reset_index(drop=True)[["from_id", "to_id", "similarity"]]
    )


def test_model_roundtrip(spark, from_list, to_list, tmp_path):
    from polyfuzz_spark.api import lists_to_df

    docs = lists_to_df(spark, from_list)
    model = fit_tfidf(docs, "key")
    save_model(model, str(tmp_path / "m"))
    back = load_model(spark, str(tmp_path / "m"))
    assert back.n_docs == model.n_docs
    assert back.config == model.config
    a = {r.term: r.idf for r in model.idf.collect()}
    b = {r.term: r.idf for r in back.idf.collect()}
    assert a == b


def test_api_save_load_transform_parity(spark, from_list, to_list, tmp_path):
    m = PolyFuzzSpark("TF-IDF", spark).fit(from_list, to_list)
    before = _canon(m.transform(from_list)["TF-IDF"])

    m.save(str(tmp_path / "pf"))
    loaded = PolyFuzzSpark.load(str(tmp_path / "pf"), spark)
    after = _canon(loaded.transform(from_list)["TF-IDF"])
    pd.testing.assert_frame_equal(before, after)


def test_save_load_roundtrips_every_matcher_config(spark, tmp_path):
    """ADVICE r01: a matcher saved with non-default top_n/min_similarity
    must reload with the SAME configuration for every matcher type (the
    reference's joblib pickle round-trips whole objects)."""
    from polyfuzz_spark.matchers import EmbeddingMatcher, TFIDFMatcher
    from polyfuzz_spark.scorers.editdistance import RapidFuzzMatcher

    m = PolyFuzzSpark(
        [
            TFIDFMatcher(n_gram_range=(2, 4), min_similarity=0.42, top_n=3,
                         clean_string=False),
            EmbeddingMatcher(min_similarity=0.75, top_n=5,
                             model_id="emb"),
            RapidFuzzMatcher(score_cutoff=0.3, scorer="token_sort_ratio",
                             top_n=2, model_id="rf", use_blocking=False,
                             blocking_conf={"bands": 8}),
        ],
        spark,
    )
    # register matchers without running match (configs only)
    for matcher in m.method:
        m._matchers[matcher.model_id] = matcher
    m.save(str(tmp_path / "pf2"))
    loaded = PolyFuzzSpark.load(str(tmp_path / "pf2"), spark)

    tf = loaded._matchers["TF-IDF"]
    assert tf.cfg.n_gram_range == (2, 4) and not tf.cfg.clean_string
    assert tf.min_similarity == 0.42 and tf.top_n == 3
    emb = loaded._matchers["emb"]
    assert emb.min_similarity == 0.75 and emb.top_n == 5
    rf = loaded._matchers["rf"]
    assert rf.score_cutoff == 0.3 and rf.scorer == "token_sort_ratio"
    assert rf.top_n == 2
    # a FORCED-exact matcher must not reload as size-adaptive (None) —
    # that would silently switch transform() to blocked candidates
    assert rf.use_blocking is False
    assert rf.blocking_conf == {"bands": 8}


def test_save_refuses_unroundtrippable_custom_matcher(spark, tmp_path):
    import pytest

    from polyfuzz_spark.matchers import BaseSparkMatcher

    class Custom(BaseSparkMatcher):
        type = "Custom"

    m = PolyFuzzSpark("TF-IDF", spark)
    m._matchers["c"] = Custom()
    with pytest.raises(NotImplementedError, match="round-trip"):
        m.save(str(tmp_path / "pf3"))


def test_embedding_save_load_transform_parity(spark, tmp_path):
    """VERDICT r02 item 4 (reference polyfuzz.py:429-457 joblib-pickles the
    fitted ``embeddings_to``): fit → save → load → transform must equal the
    pre-save transform for the EmbeddingMatcher — the serving to-side
    (ids + embeddings) round-trips through the to_list parquet, so a
    reloaded instance serves without the embedding DataFrame re-supplied."""
    import pandas as pd

    from polyfuzz_spark.matchers import EmbeddingMatcher

    to_df = spark.createDataFrame(
        [(0, "a", [1.0, 0.0]), (1, "b", [2.0, 0.0]),
         (2, "c", [0.0, 1.0]), (3, "d", [0.6, 0.8])],
        "doc_id long, key string, embedding array<double>",
    )
    fr = spark.createDataFrame(
        [(10, "q1", [0.9, 0.1]), (11, "q2", [0.1, 0.9])],
        "doc_id long, key string, embedding array<double>",
    )
    m = PolyFuzzSpark(EmbeddingMatcher(min_similarity=0.5, top_n=1), spark)
    m.fit(fr, to_df)
    pre = (
        m.transform(fr)["Embeddings"].toPandas()
        .sort_values("from_id").reset_index(drop=True)
    )
    path = str(tmp_path / "emb_model")
    m.save(path)
    m2 = PolyFuzzSpark.load(path, spark)
    restored = next(iter(m2._matchers.values()))
    assert isinstance(restored, EmbeddingMatcher)
    assert restored.min_similarity == 0.5 and restored.top_n == 1
    post = (
        m2.transform(fr)["Embeddings"].toPandas()
        .sort_values("from_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pre, post)
    assert list(post.to_id) == [0, 2]


def test_merge_tfidf_models_equals_joint_fit(spark):
    """Halves-merge == joint-fit, bit-identical IDF per term (the same
    parity contract as functions/lm.merge_hashed_lms)."""
    import random

    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.tfidf import fit_tfidf, merge_tfidf_models

    rng = random.Random(77)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 6))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, key string")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)

    joint = fit_tfidf(docs)
    merged = merge_tfidf_models(fit_tfidf(a), fit_tfidf(b))
    assert merged.n_docs == joint.n_docs

    jm = {r.term: r.idf for r in joint.idf.collect()}
    mm = {r.term: r.idf for r in merged.idf.collect()}
    assert jm == mm  # exact float equality, not approx


def test_merge_tfidf_models_rejects_config_mismatch(spark):
    import pytest

    from polyfuzz_spark.operators.tfidf import (
        TfidfConfig,
        fit_tfidf,
        merge_tfidf_models,
    )

    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, key string")
    m1 = fit_tfidf(docs)
    m2 = fit_tfidf(docs, cfg=TfidfConfig(n_gram_range=(2, 2)))
    with pytest.raises(ValueError, match="different configs"):
        merge_tfidf_models(m1, m2)
