"""Bucketed-table sink/source — co-located joins without a shuffle.

The ER pipeline's repeated access pattern is "join something keyed by
doc_id against the corpus" (candidate pairs → text gather, survivors →
content re-read, scores → metadata join). On a 100 TB corpus every such
join shuffles the *corpus* unless its layout already agrees with the join
key. Bucketing is the Spark-native fix: write the table once with
``bucketBy(n, key)`` (+ ``sortBy`` so merge-join needs no sort either) and
every subsequent equi-join or aggregation on that key reads co-located
buckets — zero Exchange on the bucketed side, forever amortized across
runs.

This module wraps the write/read pair and asserts the contract (the saved
table IS bucketed — a silent fallback to a plain write would quietly
re-introduce the shuffle), plus a join helper that verifies the plan shape
at runtime in tests (``tests/test_bucketed.py`` pins "no Exchange on the
bucketed side").

Scale notes:
- bucket count is a LAYOUT decision: pick ``n_buckets`` ≈ table size /
  target file size (128–512 MB) at write time; joins between two tables
  bucketed on the same key work shuffle-free even at different bucket
  counts (Spark 3.1+ coalesces/repartitions the smaller bucketing when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on) — same-count
  is still the fast path and what we default to.
- ``sortBy`` the bucket key so sort-merge join skips its sort stage too.
- bucketed tables require the catalog (``saveAsTable``); path-only parquet
  has no bucket metadata. On a real deployment the same call lands in the
  warehouse/Iceberg catalog (Iceberg bucket-partition transforms carry the
  same property); the sandbox uses the local ``spark-warehouse`` dir.

Reference has no storage layer at all (in-memory pandas,
``/root/reference/polyfuzz/polyfuzz.py``); this is engine infrastructure
the north rule's Iceberg deployment implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet catalog table bucketed (and sorted) by
    ``bucket_col``. Overwrites by default (layout rewrites are idempotent
    maintenance jobs)."""
    w = df.write.format("parquet").mode(mode).bucketBy(
        int(n_buckets), bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
    if not is_bucketed(df.sparkSession, table, bucket_col):
        raise RuntimeError(
            f"table {table} was written without bucket metadata — "
            "catalog does not support bucketed writes"
        )


def is_bucketed(spark, table: str, bucket_col: str | None = None) -> bool:
    """True when the catalog records bucket metadata for ``table`` (and the
    bucket column matches, when given)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    n = info.get("Num Buckets")
    if not n:
        return False
    if bucket_col is not None:
        cols = info.get("Bucket Columns", "")
        return f"`{bucket_col}`" in cols or bucket_col in cols
    return True


def co_located_join(
    spark,
    table: str,
    other: DataFrame,
    key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join ``other`` against a bucketed catalog table on its bucket key.

    The bucketed side contributes NO Exchange to the plan; only ``other``
    is shuffled (or broadcast, when small — AQE decides). Use for the
    gather/re-read joins that would otherwise shuffle the corpus per run.
    """
    return spark.read.table(table).join(other, key, how)


def repartition_for_bucketing(
    df: DataFrame, bucket_col: str, n_buckets: int
) -> DataFrame:
    """Pre-shuffle ``df`` to the bucket layout so the bucketed write emits
    ONE file per bucket instead of (input partitions × buckets) small
    files — the small-file explosion that makes naive bucketed writes
    unusable at scale. Spark's hash here matches the bucketing hash
    (both Murmur3 on the column), so each task writes exactly one bucket.
    """
    return df.repartition(int(n_buckets), F.col(bucket_col))
