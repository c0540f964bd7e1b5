"""Bucketed co-located joins (sources/bucketed.py): the bucketed side of a
key equi-join must contribute NO Exchange — the layout, not the shuffle
service, co-locates it. Pinned on the physical plan, not assumed."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.sources.bucketed import (
    co_located_join,
    is_bucketed,
    repartition_for_bucketing,
    save_bucketed,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs_table(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    save_bucketed(
        repartition_for_bucketing(docs, "doc_id", 8),
        "docs_bucketed_test", "doc_id", n_buckets=8,
    )
    yield "docs_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_test")


def test_write_records_bucket_metadata(spark, docs_table):
    assert is_bucketed(spark, docs_table, "doc_id")
    assert not is_bucketed(spark, docs_table, "lang")


def test_gather_join_has_no_exchange_on_bucketed_side(spark, docs_table):
    # the gather shape: a pair table keyed by doc_id pulls corpus text.
    # Broadcast disabled so the test pins the sort-merge layout property
    # (with broadcast on, small sides hide the question entirely).
    pairs = (
        spark.range(0, 500, 7)
        .select(F.col("id").alias("doc_id"), F.lit("x").alias("tag"))
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = co_located_join(spark, docs_table, pairs, "doc_id")
        plan = plan_of(joined)
        # exactly ONE Exchange node: the probe (pairs) side. The bucketed
        # scan must feed the join bare — no shuffle above it. (formatted
        # mode prints the node name alone; hashpartitioning sits on the
        # Arguments line.)
        assert plan.count(") Exchange") == 1, plan
        assert "SortMergeJoin" in plan, plan
        # bucketed side is pre-sorted by the key: its join input needs no
        # Sort either (one Sort total, on the probe side)
        assert plan.count(") Sort ") <= 1, plan
        assert joined.count() == 72  # ids 0,7,...,497 ∩ [0,500) = 72 docs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_needs_no_exchange(spark, docs_table):
    # aggregation on the bucket key rides the layout too
    agg = (
        spark.read.table(docs_table)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_one_file_per_bucket(spark, docs_table):
    # repartition_for_bucketing collapses the small-file explosion:
    # 8 buckets → exactly 8 data files
    loc = [
        r["data_type"]
        for r in spark.sql(
            f"DESCRIBE TABLE EXTENDED {docs_table}"
        ).collect()
        if r["col_name"] == "Location"
    ][0]
    import glob
    import os

    files = glob.glob(os.path.join(loc.removeprefix("file:"), "*.parquet"))
    assert len(files) == 8, files


def test_join_values_match_plain_join(spark, docs_table):
    pairs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    via_bucket = co_located_join(spark, docs_table, pairs, "doc_id")
    plain = spark.read.parquet(f"{SF}/documents.parquet").join(
        pairs, "doc_id"
    )
    assert via_bucket.exceptAll(plain).count() == 0
    assert plain.exceptAll(via_bucket).count() == 0
