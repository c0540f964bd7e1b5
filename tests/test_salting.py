"""Hot-term salting must be a pure join-key refinement: identical result
rows with and without salting (the north-rule skew handling in
``cosine_join.sparse_cosine_pairs``)."""

import pandas as pd

from polyfuzz_spark.api import lists_to_df
from polyfuzz_spark.operators.cosine_join import sparse_cosine_pairs
from polyfuzz_spark.operators.tfidf import fit_tfidf, vectorize


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    # salting changes float summation order; compare far below the engine's
    # milli quantization but above double noise
    pdf["sim"] = pdf["sim"].round(9)
    return (
        pdf.sort_values(["from_id", "to_id"]).reset_index(drop=True)
    )


def test_salted_equals_unsalted_on_hot_term(spark):
    # every doc shares the hot trigrams 'the'/'hea'/'eaa' (df = 24 docs),
    # so salt_df_above=3 splits the from-side into 8 salt groups
    docs = lists_to_df(spark, [f"theaa{i:02d}x" for i in range(24)])
    model = fit_tfidf(docs, "key")
    vec = vectorize(model, docs, "key")
    unsalted = sparse_cosine_pairs(
        vec, vec, exclude_self=True, salt_df_above=None
    )
    salted = sparse_cosine_pairs(vec, vec, exclude_self=True, salt_df_above=3)
    a, b = _canon(unsalted), _canon(salted)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
