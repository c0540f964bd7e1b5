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
