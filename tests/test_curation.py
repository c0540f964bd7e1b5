"""Unit behavior of the curation verdict (functions/curation.py): each rule
fires on a planted document, reasons report in fixed order, multi-rule docs
report every fired rule, and curate() drops exactly the flagged docs. The
contract query + DuckDB oracle are covered by test_queries_oracle.py."""

import pytest

from polyfuzz_spark.functions.curation import (
    RULE_ORDER,
    curate,
    curation_verdict,
)

GOOD = (
    "def parse(tokens): return [normalize(t) for t in tokens if t] "
    "plus enough distinct filler words to clear every single threshold "
    "easily alpha beta gamma delta epsilon zeta eta theta iota kappa"
)


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = [
        (1, GOOD),                                   # clean
        (2, "too short"),                            # too_few_tokens
        (3, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21"),
        # ^ 21 digit tokens: low_alpha (alpha ratio 0), all distinct
        (4, " ".join(["dup"] * 30)),                 # repetitive + bigram-heavy
        (5, GOOD + " spam ham " * 1),                # still clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation_verdict(df)
    return {r.doc_id: r for r in out.collect()}


def test_clean_docs_kept(verdicts):
    assert verdicts[1].keep and verdicts[1].reasons == ""
    assert verdicts[5].keep and verdicts[5].reasons == ""


def test_each_rule_fires(verdicts):
    # a 2-token doc's single bigram carries all bigram mass, so the
    # bigram rule fires alongside the length rule
    assert verdicts[2].reasons == "too_few_tokens,top_bigram_heavy"
    assert verdicts[3].reasons == "low_alpha"
    # doc 4: 30 copies of one token -> dup frac 966, top bigram carries
    # ALL bigram mass (1000), and the 29 separator spaces drag the alpha
    # ratio to 756 < 800
    assert (
        verdicts[4].reasons
        == "low_alpha,repetitive_tokens,top_bigram_heavy"
    )
    assert not verdicts[4].keep


def test_reason_order_is_fixed(verdicts):
    for r in verdicts.values():
        fired = [x for x in r.reasons.split(",") if x]
        assert fired == [n for n in RULE_ORDER if n in fired]


def test_signal_columns_present(verdicts):
    r = verdicts[4]
    assert r.n_tokens == 30
    assert r.dup_token_frac_milli == 966
    assert r.top_bigram_frac_milli == 1000


def test_curate_drops_flagged(spark, verdicts):
    rows = [(i, v.reasons) for i, v in verdicts.items()]
    df = spark.createDataFrame(
        [(1, GOOD), (2, "too short"), (4, " ".join(["dup"] * 30))],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in curate(df).collect()}
    assert kept == {1}


def test_threshold_override(spark):
    # 15 distinct words: top-bigram mass 71 and alpha ratio fine, so only
    # the length rule separates strict from lax
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    strict = curation_verdict(df, min_tokens=20).collect()[0]
    lax = curation_verdict(df, min_tokens=10).collect()[0]
    assert strict.reasons == "too_few_tokens" and lax.keep
