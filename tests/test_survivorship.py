"""Golden-record survivorship (operators/survivorship.py): field-level
merge rules over an assignments table — longest content with provenance,
modal categoricals, singleton semantics, deterministic tie-breaks."""

from pyspark.sql import functions as F

from polyfuzz_spark.operators.survivorship import golden_records


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, key string, lang string, source string"
    )


def _asg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rep long")


def test_longest_content_survives_with_sha(spark):
    docs = _docs(spark, [
        (1, "aa", "py", "gh"),
        (2, "aaaa", "py", "gl"),
        (3, "bb", "go", "gh"),
    ])
    asg = _asg(spark, [(1, 1), (2, 1), (3, 1)])
    row = golden_records(
        docs, asg, content_col="key", modal_cols=("lang", "source")
    ).collect()[0]
    assert row.rep_doc_id == 1 and row.n_members == 3
    assert row.longest_doc_id == 2
    import hashlib

    assert row.golden_sha == hashlib.sha256(b"aaaa").hexdigest()
    assert row.lang == "py"  # 2-vs-1 majority
    assert row.source == "gh"  # 2-vs-1 majority


def test_ties_break_to_min_id_and_min_value(spark):
    # equal lengths → min doc_id wins; 1-1 modal tie → min value wins
    docs = _docs(spark, [
        (5, "xx", "py", "gh"),
        (7, "yy", "go", "gl"),
    ])
    asg = _asg(spark, [(5, 5), (7, 5)])
    row = golden_records(
        docs, asg, content_col="key", modal_cols=("lang", "source")
    ).collect()[0]
    assert row.longest_doc_id == 5
    assert row.lang == "go" and row.source == "gh"


def test_singletons_are_one_clusters_of_themselves(spark):
    docs = _docs(spark, [(1, "a", "py", "gh"), (9, "bbb", "go", "gl")])
    # 9 absent from assignments → its own 1-cluster
    asg = _asg(spark, [(1, 1)])
    out = {
        r.rep_doc_id: r
        for r in golden_records(
            docs, asg, content_col="key", modal_cols=("lang",)
        ).collect()
    }
    assert out[9].n_members == 1 and out[9].longest_doc_id == 9
    assert out[9].lang == "go"


def test_no_window_over_raw_members_in_plan(spark):
    # every survivorship rule must be an aggregate, not a per-member sort:
    # the physical plan may not contain a Window operator
    docs = _docs(spark, [(1, "a", "py", "gh"), (2, "ab", "py", "gh")])
    asg = _asg(spark, [(1, 1), (2, 1)])
    plan = (
        golden_records(docs, asg, content_col="key", modal_cols=("lang",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_null_content_never_beats_real_content(spark):
    docs = _docs(spark, [
        (1, None, "py", "gh"),
        (2, "a", "py", "gh"),
    ])
    asg = _asg(spark, [(1, 1), (2, 1)])
    row = golden_records(
        docs, asg, content_col="key", modal_cols=("lang",)
    ).collect()[0]
    assert row.longest_doc_id == 2
    import hashlib

    assert row.golden_sha == hashlib.sha256(b"a").hexdigest()


def test_all_null_cluster_degrades_gracefully(spark):
    docs = _docs(spark, [
        (3, None, None, "gh"),
        (4, None, None, "gl"),
    ])
    asg = _asg(spark, [(3, 3), (4, 3)])
    row = golden_records(
        docs, asg, content_col="key", modal_cols=("lang",)
    ).collect()[0]
    assert row.longest_doc_id == 3  # min-id fallback
    assert row.golden_sha is None
    assert row.lang is None  # no non-null votes -> left-join null
