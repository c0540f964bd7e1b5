"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship match→group pipeline on sf0.001 documents.
queries()     — 67 entries, one per implemented operator (SURVEY.md §2 +
                the training-data-pipeline extensions), from
                polyfuzz_spark.queries.
oracle_sql()  — 63 exact DuckDB twins (SimHash included: its md5-backed
                term hash is bit-identical in DuckDB; the IVF machinery via
                its full-probe twin, which degenerates to exact brute
                force). Approximate or composite operators (probe-limited
                LSH/IVF ANN, WRatio) are rows-only by design, with recall
                floors tested vs exact twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TF-IDF self-match + transitive grouping over the sf0.001
    documents table — the reference's match→group lifecycle end-to-end."""
    from polyfuzz_spark.matchers import TFIDFMatcher
    from polyfuzz_spark.operators.grouping import add_groups

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.col("text").alias("key")
    )
    matcher = TFIDFMatcher(min_similarity=0.3, top_n=1)
    matches = matcher.match_df(docs)
    grouper = TFIDFMatcher(n_gram_range=(3, 3), min_similarity=0.6)
    grouped, _assignments = add_groups(matches, grouper, 0.6)
    return grouped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polyfuzz_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from polyfuzz_spark.queries import all_oracles

    return all_oracles()
