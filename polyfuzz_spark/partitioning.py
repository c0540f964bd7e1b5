"""Partition-width guard for CPU-heavy per-row kernels.

Local-mode single-file reads (and AQE-coalesced shuffle outputs, which
Spark sizes by shuffle BYTES, not by downstream cost) arrive with 1-3
partitions; feeding those straight into an n-gram explode or a Pandas-UDF
kernel serializes the work onto as many tasks. A 100 TB table arrives with
thousands of file splits and is left untouched — the guard only widens
inputs that are narrower than the session's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_parts`` (default: the
    session's ``defaultParallelism``) when it currently has fewer
    partitions; wide inputs pass through untouched. Row content and
    therefore every downstream result is unchanged — only task fan-out."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
