"""Corpus curation verdicts: Gopher/C4-style per-document quality rules
composed into a keep/drop decision with machine-readable reasons.

The filter step of a training-data pipeline (Rae et al. 2021 §A.1.1,
Raffel et al. 2020 §2.2): cheap per-document signals — token count,
alphabetic ratio, duplicate-token fraction, top-bigram mass — each gated by
a threshold, a document dropped when ANY rule fires, and the fired rules
reported so curation decisions are auditable.

No reference analog (PolyFuzz matches strings, it does not curate them);
built on the same shared Spark/SQL signal twins in ``textstats`` so the
verdict has an exact DuckDB oracle.

Scale shape: every scalar signal is a map-side JVM expression over the
scan; the only shuffle is the top-bigram aggregation — explode → two
map-side-combinable hash aggregations keyed by doc id (the exact plan of
the repetition query) — followed by one equi-join back on the id. Nothing
is corpus-global: thresholds are constants, so the filter composes with
partition pruning and runs embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats as TS

# rule names in their FIXED reporting order (reasons concatenate in this
# order on both engines — no sort-collation dependence)
RULE_ORDER = (
    "too_few_tokens",
    "low_alpha",
    "repetitive_tokens",
    "top_bigram_heavy",
)

DEFAULT_THRESHOLDS = {
    "min_tokens": 20,
    "min_alpha_milli": 800,
    "max_dup_token_milli": 650,
    "max_top_bigram_milli": 120,
}


def top_bigram_frac_milli(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """⌊1000 · count(most frequent word bigram) / count(bigrams)⌋ per doc
    — ``(id_col, top_bigram_frac_milli)``; docs with < 2 tokens emit
    nothing (callers coalesce to 0)."""
    toked = df.select(F.col(id_col), TS.tokens(text_col).alias("__toks"))
    bigs = toked.where(F.size("__toks") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.concat(
                    F.element_at(F.col("__toks"), i),
                    F.lit(" "),
                    F.element_at(F.col("__toks"), i + 1),
                ),
            )
        ).alias("__bg"),
    )
    return (
        bigs.groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.floor(F.lit(1000.0) * F.max("__c") / F.sum("__c"))
            .cast("bigint")
            .alias("top_bigram_frac_milli")
        )
    )


def _max_run_length(arr_col: str):
    """Longest run of equal adjacent elements in a SORTED array column —
    i.e. the count of the most frequent element — as one pure map-side
    ``aggregate`` expression (no shuffle). 0 for an empty array."""
    run_of = lambda acc, x: F.when(
        x == acc["prev"], acc["run"] + F.lit(1)
    ).otherwise(F.lit(1))
    return F.aggregate(
        F.col(arr_col),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_of(acc, x).alias("run"),
            F.greatest(acc["best"], run_of(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def curation_verdict(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = DEFAULT_THRESHOLDS["min_tokens"],
    min_alpha_milli: int = DEFAULT_THRESHOLDS["min_alpha_milli"],
    max_dup_token_milli: int = DEFAULT_THRESHOLDS["max_dup_token_milli"],
    max_top_bigram_milli: int = DEFAULT_THRESHOLDS["max_top_bigram_milli"],
) -> DataFrame:
    """Per-document verdict: the four signals, ``keep`` (no rule fired) and
    ``reasons`` (fired rule names in ``RULE_ORDER``, comma-joined, '' when
    kept).

    Fully map-side: the top-bigram mass is computed PER ROW as the longest
    equal-run in the sorted bigram array (== the max bigram count, exactly
    the relational :func:`top_bigram_frac_milli`) instead of the
    explode → two-aggregation → join plan, so the verdict has NO shuffle at
    all — it composes with partition pruning, streams (stateless
    micro-batch map), and costs O(tokens log tokens) per document."""
    toked = df.select(
        F.col(id_col),
        TS.alpha_ratio_milli(text_col).alias("alpha_milli"),
        TS.dup_token_frac_milli(text_col).alias("dup_token_frac_milli"),
        TS.tokens(text_col).alias("__toks"),
    )
    bigs = toked.select(
        F.col(id_col),
        "alpha_milli",
        "dup_token_frac_milli",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.when(
            F.size("__toks") >= 2,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("__toks"), i),
                        F.lit(" "),
                        F.element_at(F.col("__toks"), i + 1),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>")).alias("__bigs"),
    )
    sig = bigs.withColumn(
        "top_bigram_frac_milli",
        F.when(F.size("__bigs") == 0, F.lit(0)).otherwise(
            F.floor(
                F.lit(1000.0) * _max_run_length("__bigs") / F.size("__bigs")
            )
        ).cast("bigint"),
    )
    fired = {
        "too_few_tokens": F.col("n_tokens") < min_tokens,
        "low_alpha": F.col("alpha_milli") < min_alpha_milli,
        "repetitive_tokens": F.col("dup_token_frac_milli")
        > max_dup_token_milli,
        "top_bigram_heavy": F.col("top_bigram_frac_milli")
        > max_top_bigram_milli,
    }
    # concat_ws skips NULLs in both engines -> fixed-order reason string
    reasons = F.concat_ws(
        ",", *[F.when(fired[name], F.lit(name)) for name in RULE_ORDER]
    )
    return sig.select(
        F.col(id_col),
        "n_tokens",
        "alpha_milli",
        "dup_token_frac_milli",
        "top_bigram_frac_milli",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def curate(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds: int,
) -> DataFrame:
    """The corpus with dropped documents removed (semi-join on the kept
    verdict ids — the verb form of :func:`curation_verdict`)."""
    kept = (
        curation_verdict(df, text_col=text_col, id_col=id_col, **thresholds)
        .where("keep")
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def curation_verdict_sql(
    table: str = "documents",
    *,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    min_tokens: int = DEFAULT_THRESHOLDS["min_tokens"],
    min_alpha_milli: int = DEFAULT_THRESHOLDS["min_alpha_milli"],
    max_dup_token_milli: int = DEFAULT_THRESHOLDS["max_dup_token_milli"],
    max_top_bigram_milli: int = DEFAULT_THRESHOLDS["max_top_bigram_milli"],
) -> str:
    """The DuckDB twin of :func:`curation_verdict` (shared thresholds and
    reason order so query and oracle cannot drift)."""
    t = TS.tokens_sql(text_expr)
    fired = {
        "too_few_tokens": f"n_tokens < {min_tokens}",
        "low_alpha": f"alpha_milli < {min_alpha_milli}",
        "repetitive_tokens": f"dup_token_frac_milli > {max_dup_token_milli}",
        "top_bigram_heavy": f"top_bigram_frac_milli > {max_top_bigram_milli}",
    }
    cases = ", ".join(
        f"CASE WHEN {fired[name]} THEN '{name}' END" for name in RULE_ORDER
    )
    return f"""
WITH toks AS (SELECT {id_expr} AS id, {text_expr} AS txt, {t} AS tk
              FROM {table}),
bigs AS (
  SELECT id, unnest(list_transform(generate_series(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i + 1])) AS bg
  FROM toks WHERE len(tk) >= 2),
cnt AS (SELECT id, bg, count(*) AS c FROM bigs GROUP BY 1, 2),
tb AS (SELECT id, CAST(floor(1000.0 * max(c) / sum(c)) AS BIGINT) AS tbf
       FROM cnt GROUP BY 1),
sig AS (
  SELECT toks.id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         {TS.alpha_ratio_milli_sql('txt')} AS alpha_milli,
         {TS.dup_token_frac_milli_sql('txt')} AS dup_token_frac_milli,
         CAST(coalesce(tbf, 0) AS BIGINT) AS top_bigram_frac_milli
  FROM toks LEFT JOIN tb ON toks.id = tb.id),
verdict AS (
  SELECT *, concat_ws(',', {cases}) AS reasons FROM sig)
SELECT id AS {id_expr}, n_tokens, alpha_milli, dup_token_frac_milli,
       top_bigram_frac_milli, reasons = '' AS keep, reasons
FROM verdict
"""
