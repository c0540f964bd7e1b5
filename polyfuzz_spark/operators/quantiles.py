"""Exact grouped quantiles over bounded-cardinality values — the
scale-correct way to calibrate curation thresholds from the corpus itself.

A training-data pipeline rarely hardcodes "drop quality < 310"; it derives
the cut from the observed distribution ("drop the worst decile per
language"). The naive exact quantile — window-sort each group — puts every
group in ONE task, so the dominant language of a 100 TB corpus lands on a
single executor. ``approx_percentile`` scales but is not exactly
reproducible across engines or runs.

This operator is exact AND scale-flat by exploiting that pipeline scores
are already quantized (milli-units in [0, 1000], see ``functions/
textstats.py``): one map-side-combined ``groupBy(group, value).count()``
collapses the corpus to at most ``groups × distinct-values`` rows (≤ ~100k
for 100 languages × 1001 buckets — trivially small no matter how many
petabytes produced it), and the quantile is read off the cumulative
histogram. Shuffle cost is the tiny histogram, never the corpus; the only
windows run over the bounded histogram table.

Definition (matches ``quantile_disc`` / numpy ``interpolation='lower'``):
the p-quantile of n values is the k-th smallest with
``k = floor(p * (n - 1)) + 1``. Pure integer arithmetic end-to-end, so the
DuckDB twin hash-matches bit-for-bit.

The reference has no quantile surface (its score distributions are pandas
``describe()`` one-liners); this module is an engine extension like
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps_milli: list[int],
) -> DataFrame:
    """Exact per-group quantiles of an integer-valued column.

    ``ps_milli`` are quantile probabilities in milli-units (e.g. ``[100,
    500, 900]`` for P10/P50/P90). Returns one row per (group, p):
    ``(group_col, p_milli, n, value)`` where ``value`` is the k-th
    smallest of the group's n values, ``k = floor(p/1000 * (n-1)) + 1``.

    ``value_col`` must be integer-typed (the histogram contract); raises
    otherwise rather than silently hashing doubles.
    """
    dt = dict(df.dtypes).get(value_col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"grouped_exact_quantiles needs an integer value column "
            f"(quantize first — see functions/textstats milli scores); "
            f"{value_col} is {dt}"
        )
    if not ps_milli or any(not (0 <= p <= 1000) for p in ps_milli):
        raise ValueError(f"ps_milli must be within [0, 1000], got {ps_milli}")
    hist = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "g", "v", "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    ps = ",".join(str(int(p)) for p in sorted(set(ps_milli)))
    # k-th smallest sits in the first histogram bucket whose cumulative
    # count reaches k: cum - c < k <= cum — exactly one bucket per (g, p)
    return (
        cum.select(
            "g", "v", "c", "cum", "n",
            F.explode(F.expr(f"array({ps})")).alias("p_milli"),
        )
        .withColumn(
            "k", F.expr("CAST(floor(p_milli / 1000.0 * (n - 1)) AS BIGINT) + 1")
        )
        .where((F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("c") < F.col("k")))
        .select(
            F.col("g").alias(group_col),
            F.col("p_milli").cast("bigint").alias("p_milli"),
            F.col("n").alias("n"),
            F.col("v").alias("value"),
        )
    )


def grouped_quantiles_oracle_sql(
    group_sql: str,
    value_sql: str,
    ps_milli: list[int],
    *,
    table: str = "documents",
    group_alias: str = "lang",
) -> str:
    """DuckDB twin of :func:`grouped_exact_quantiles`: same histogram,
    same cumulative-bucket selection, same integer k arithmetic."""
    ps = ",".join(f"({int(p)})" for p in sorted(set(ps_milli)))
    return f"""
WITH hist AS (
  SELECT {group_sql} AS g, CAST({value_sql} AS BIGINT) AS v,
         count(*) AS c
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM hist
),
ps(p_milli) AS (VALUES {ps})
SELECT g AS {group_alias},
       CAST(p_milli AS BIGINT) AS p_milli,
       CAST(n AS BIGINT) AS n,
       v AS value
FROM cum CROSS JOIN ps
WHERE cum >= CAST(floor(p_milli / 1000.0 * (n - 1)) AS BIGINT) + 1
  AND cum - c < CAST(floor(p_milli / 1000.0 * (n - 1)) AS BIGINT) + 1
"""
