"""visualize_precision_recall facade parity — mirrors
``/root/reference/tests/test_metrics.py:12-27``: curve length is
int(1/step)+1, recall decreases across the sweep, average precision
increases. Plotting is data-only in this sandbox (no matplotlib)."""

import pytest

from polyfuzz_spark.api import PolyFuzzSpark


@pytest.mark.parametrize("step", [0.01, 0.1])
def test_pr_curve_contract(spark, from_list, to_list, step):
    m = PolyFuzzSpark("TF-IDF", spark).match(from_list, to_list)
    pdf = m.visualize_precision_recall(precision_step=step)
    assert len(pdf) == int(1 / step) + 1
    assert list(pdf.columns) == ["min_precision", "recall",
                                 "average_precision"]
    rec = pdf.sort_values("min_precision").recall.tolist()
    avg = pdf.sort_values("min_precision").average_precision.dropna().tolist()
    assert rec[0] > rec[-1]
    assert avg[0] < avg[-1]


def test_pr_requires_match_first(spark):
    with pytest.raises(ValueError, match="match"):
        PolyFuzzSpark("TF-IDF", spark).visualize_precision_recall()
