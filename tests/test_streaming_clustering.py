"""Streaming cluster maintenance (streaming/clustering.py): the converged
assignments after a stream of edge micro-batches must equal one batch
connected-components run over all edges, and the versioned-state fold must
be idempotent under checkpoint replay."""

from pyspark.sql import functions as F

from polyfuzz_spark.operators.linkage import connected_components
from polyfuzz_spark.streaming.clustering import (
    latest_state_version,
    read_assignments,
    stream_cluster_maintenance,
)

EDGE_SCHEMA = "src string, dst string"


def _rows(df):
    return sorted(
        (r.key, r.representative, r.cluster_id)
        for r in df.select("key", "representative", "cluster_id").collect()
    )


def _write_batches(spark, in_dir, batches):
    for i, pairs in enumerate(batches):
        spark.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], EDGE_SCHEMA
        ).coalesce(1).write.mode("append").parquet(in_dir)


def test_stream_equals_batch_cc(spark, tmp_path):
    # batch 1 builds two clusters, batch 2 bridges them, batch 3 brings a
    # disjoint new cluster — the maintenance chain must converge to the
    # same table as one CC over the union graph
    batches = [
        [(1, 2), (3, 4)],
        [(2, 3), (4, 5)],
        [(8, 9)],
    ]
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    _write_batches(spark, in_dir, batches)
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_cluster_maintenance(stream, state_dir, ck_dir)
    q.awaitTermination(120)

    all_edges = spark.createDataFrame(
        [(str(a), str(b)) for bt in batches for a, b in bt], EDGE_SCHEMA
    )
    assert _rows(read_assignments(spark, state_dir)) == _rows(
        connected_components(all_edges)
    )
    # the version chain is pruned to the retention window (default 2):
    # state storage stays O(state), not O(batches × state)
    import os

    versions = [d for d in os.listdir(state_dir) if d.startswith("v=")]
    assert len(versions) <= 2


def test_late_batches_resume_from_committed_state(spark, tmp_path):
    # second stream start on the same checkpoint picks up only the new
    # file and folds it into the state the first run left behind
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    _write_batches(spark, in_dir, [[(1, 2), (3, 4)]])
    stream = lambda: (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream_cluster_maintenance(stream(), state_dir, ck_dir).awaitTermination(120)
    v1 = latest_state_version(state_dir)
    _write_batches(spark, in_dir, [[(2, 3)]])
    stream_cluster_maintenance(stream(), state_dir, ck_dir).awaitTermination(120)
    assert latest_state_version(state_dir) > v1
    got = read_assignments(spark, state_dir)
    want = connected_components(
        spark.createDataFrame(
            [("1", "2"), ("3", "4"), ("2", "3")], EDGE_SCHEMA
        )
    )
    assert _rows(got) == _rows(want)


def test_fold_is_replay_idempotent(spark, tmp_path):
    # simulate a crash between state write and checkpoint commit: the
    # replayed batch must read the same predecessor version and rewrite
    # an identical v=<id> (exactly-once by idempotence)
    from polyfuzz_spark.operators.linkage import incremental_components

    state_dir = str(tmp_path / "state")
    base = connected_components(
        spark.createDataFrame([("1", "2")], EDGE_SCHEMA)
    )
    base.write.parquet(f"{state_dir}/v=0")
    batch = spark.createDataFrame([("2", "3")], EDGE_SCHEMA)

    def fold(batch_id):
        prev = latest_state_version(state_dir, before=batch_id)
        state = spark.read.parquet(f"{state_dir}/v={prev}")
        out = incremental_components(
            state.select("key", "representative"), batch
        )
        out.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")

    fold(1)
    first = _rows(spark.read.parquet(f"{state_dir}/v=1"))
    fold(1)  # replay
    assert _rows(spark.read.parquet(f"{state_dir}/v=1")) == first
    # and the replay did NOT read its own output as input
    assert latest_state_version(state_dir, before=1) == 0


def test_audit_churn_sidecar(spark, tmp_path):
    import json
    import os

    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    _write_batches(spark, in_dir, [[(1, 2), (3, 4)], [(2, 3)]])
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_cluster_maintenance(
        stream, state_dir, ck_dir, audit_churn=True
    )
    q.awaitTermination(120)
    audits = sorted(os.listdir(f"{state_dir}/churn"))
    assert len(audits) == 2
    first = json.loads(open(f"{state_dir}/churn/{audits[0]}").read())
    # first fold vs empty state: every clustered key "moved" from its
    # singleton self to a cluster rep except the reps themselves
    assert first["n_records"] == 4 and first["n_moved"] == 2
    second = json.loads(open(f"{state_dir}/churn/{audits[1]}").read())
    # merge of {1,2} and {3,4}: keys 3 and 4 move to rep 1
    assert second["n_moved"] == 2
    assert second["n_clusters_old"] == 2 and second["n_clusters_new"] == 1


def test_streaming_golden_maintenance_equals_full(spark, tmp_path):
    """With a static corpus configured, the maintained golden table after
    the stream drains must equal a from-scratch golden_records over the
    final assignments."""
    from polyfuzz_spark.operators.survivorship import golden_records
    from polyfuzz_spark.streaming.clustering import read_golden

    docs = spark.createDataFrame(
        [("1", "aa", "py"), ("2", "bbbb", "py"), ("3", "c", "go"),
         ("4", "dd", "go"), ("5", "eee", "py")],
        "doc_id string, key string, lang string",
    )
    batches = [[(1, 2), (3, 4)], [(2, 3)], [(4, 5)]]
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    _write_batches(spark, in_dir, batches)
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_cluster_maintenance(
        stream, state_dir, ck_dir,
        docs=docs, golden_modal_cols=("lang",),
    )
    q.awaitTermination(180)

    final_asg = read_assignments(spark, state_dir).select(
        F.col("key").alias("doc_id"),
        F.col("representative").alias("rep"),
    )
    want = golden_records(
        docs, final_asg, content_col="key", modal_cols=("lang",)
    )
    got = read_golden(spark, state_dir)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_golden_chain_lag_triggers_full_recompute(spark, tmp_path):
    """A run WITHOUT docs advances the state chain but not the golden
    chain; the next run WITH docs must detect the lag and fully recompute
    instead of diffing against a stale golden base (which would pass
    obsolete rows through the anti-join forever)."""
    from polyfuzz_spark.operators.survivorship import golden_records
    from polyfuzz_spark.streaming.clustering import read_golden

    docs = spark.createDataFrame(
        [("1", "aa", "py"), ("2", "bb", "py"), ("3", "cc", "go"),
         ("4", "dddd", "go"), ("5", "e", "py")],
        "doc_id string, key string, lang string",
    )
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    stream = lambda: (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    # run 1 WITH docs: golden v tracks state v
    _write_batches(spark, in_dir, [[(1, 2)]])
    stream_cluster_maintenance(
        stream(), state_dir, ck_dir, docs=docs, golden_modal_cols=("lang",)
    ).awaitTermination(120)
    # run 2 WITHOUT docs: {3,4} clusters, golden chain lags
    _write_batches(spark, in_dir, [[(3, 4)]])
    stream_cluster_maintenance(
        stream(), state_dir, ck_dir
    ).awaitTermination(120)
    # run 3 WITH docs again: batch touches only {1,2,5}; without the lag
    # guard, cluster {3,4}'s golden rows would be stale singletons
    _write_batches(spark, in_dir, [[(2, 5)]])
    stream_cluster_maintenance(
        stream(), state_dir, ck_dir, docs=docs, golden_modal_cols=("lang",)
    ).awaitTermination(120)

    final_asg = read_assignments(spark, state_dir).select(
        F.col("key").alias("doc_id"),
        F.col("representative").alias("rep"),
    )
    want = golden_records(
        docs, final_asg, content_col="key", modal_cols=("lang",)
    )
    got = read_golden(spark, state_dir, modal_cols=("lang",))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_read_golden_empty_schema_carries_modal_cols(spark, tmp_path):
    from polyfuzz_spark.streaming.clustering import read_golden

    df = read_golden(spark, str(tmp_path / "none"), modal_cols=("lang",))
    assert "lang" in df.columns and df.count() == 0
