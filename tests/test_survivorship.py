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


def _full_vs_incremental(spark, doc_rows, old_pairs, new_pairs):
    """old/new_pairs: (doc_id, rep) assignment tuples."""
    from polyfuzz_spark.operators.survivorship import (
        golden_records,
        incremental_golden_records,
    )

    docs = _docs(spark, doc_rows)
    oa, na = _asg(spark, old_pairs), _asg(spark, new_pairs)
    old_golden = golden_records(
        docs, oa, content_col="key", modal_cols=("lang",)
    )
    got = incremental_golden_records(
        docs, old_golden, oa, na, content_col="key", modal_cols=("lang",)
    )
    want = golden_records(docs, na, content_col="key", modal_cols=("lang",))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_incremental_golden_merge_and_split(spark):
    docs = [
        (1, "aa", "py", "gh"), (2, "bbbb", "py", "gh"),
        (3, "c", "go", "gl"), (4, "dd", "go", "gl"), (5, "e", "py", "gh"),
    ]
    # clusters {1,2} and {3,4} merge into {1,2,3,4}; 5 stays singleton
    _full_vs_incremental(
        spark, docs,
        [(1, 1), (2, 1), (3, 3), (4, 3)],
        [(1, 1), (2, 1), (3, 1), (4, 1)],
    )
    # {1,2} splits: 2 becomes its own cluster
    _full_vs_incremental(
        spark, docs, [(1, 1), (2, 1)], [(1, 1)],
    )


def test_incremental_golden_untouched_clusters_pass_through(spark):
    docs = [
        (1, "aa", "py", "gh"), (2, "b", "py", "gh"),
        (7, "ccc", "go", "gl"), (8, "d", "go", "gl"), (9, "ee", "py", "gh"),
    ]
    # {7,8} untouched; 9 joins {1,2}
    _full_vs_incremental(
        spark, docs,
        [(1, 1), (2, 1), (7, 7), (8, 7)],
        [(1, 1), (2, 1), (9, 1), (7, 7), (8, 7)],
    )


def test_incremental_golden_fuzz_vs_full(spark):
    import random

    rng = random.Random(99)
    for trial in range(4):
        n = rng.randint(4, 12)
        docs = [
            (i, "x" * rng.randint(1, 6), rng.choice(["py", "go"]),
             rng.choice(["gh", "gl"]))
            for i in range(n)
        ]

        def rand_asg():
            pairs = []
            ids = list(range(n))
            rng.shuffle(ids)
            while ids:
                size = min(len(ids), rng.randint(1, 4))
                group, ids = ids[:size], ids[size:]
                rep = min(group)
                if size > 1 or rng.random() < 0.5:
                    pairs += [(g, rep) for g in group]
            return pairs

        _full_vs_incremental(spark, docs, rand_asg(), rand_asg())
