"""DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
2023) — distributed, in pure integer arithmetic.

The published recipe for "pick the raw-crawl documents that look like the
trusted corpus": featurize every document as a bag of hashed unigrams +
bigrams, fit two bucket count distributions (target = trusted corpus, raw
= the crawl being selected from), weight each raw document by the
log-likelihood ratio ``log p_target(doc) − log p_raw(doc)`` under the two
hashed bag-of-ngrams models, and keep the top-k. The reference engine
(PolyFuzz) has no data-selection surface; this is an engine extension in
the training-data-pipeline family (``functions/lm.py`` is the same model
family pointed at quality filtering instead of domain selection).

Scale shape mirrors ``functions/lm.py`` exactly:

* both fitted distributions are FIXED-size tables (≤ ``n_buckets`` rows,
  default 2^16 — the paper uses 10^4) — always broadcastable;
* scoring = one map-side feature explode per doc → broadcast left join
  against the merged two-sided count table → one doc-keyed agg;
* selection = ``orderBy(...).limit(k)`` → TakeOrderedAndProject (per-
  partition top-k + driver merge of k rows, never a global sort);
* the LLR is quantized to whole bits per feature occurrence via the exact
  integer ``floor_log2`` (``functions/lm.py``) with add-one smoothing —
  no double ``log`` crosses an engine boundary, so the DuckDB twin
  hash-matches bit-for-bit::

      llr_bits(f) = [fl2(cnt_t[f]+1) − fl2(total_t + nb)]
                  − [fl2(cnt_r[f]+1) − fl2(total_r + nb)]
      weight_bits(doc) = Σ_occurrences llr_bits(f)     (positive ⇒ target-like)

The paper resamples with Gumbel noise to avoid a deterministic top-k
concentrating on near-duplicates; the engine form is deterministic top-k
with a (weight desc, id) tie-break — in this pipeline diversity is
handled by the dedup family upstream (``operators/dedup.py``), which is
the stronger tool for it, and determinism is what makes the selection
rescan-stable and oracle-checkable (the same trade ``functions/
sampling.py`` makes vs ``df.sample``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.lm import (
    DEFAULT_BUCKETS,
    floor_log2,
    floor_log2_sql,
    token_buckets_sql,
)
from ..functions.sampling import _HEX_DIGITS
from ..functions.textstats import tokens, tokens_sql
from ..partitioning import ensure_min_partitions


def _bucket(col: Column, n_buckets: int, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", col, F.lit(salt))), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("bigint") % F.lit(n_buckets)


def doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    bigrams: bool = True,
) -> DataFrame:
    """Hashed n-gram feature OCCURRENCES per document: ``(id_col, bucket)``
    with one row per unigram and (optionally) per bigram occurrence —
    multiplicity preserved, as the DSIR bag-of-ngrams requires. Map-side:
    tokenize → bucket lambdas → ONE inline explode (no materialized array
    column — see operators/decontam.py:77 on InferFiltersFromGenerate)."""
    toked = ensure_min_partitions(df).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )
    uni = F.transform("__toks", lambda t: _bucket(t, n_buckets, salt))
    bi = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("__toks") - 1, F.lit(1))),
            lambda i: _bucket(
                F.array_join(F.slice("__toks", i, 2), " "), n_buckets, salt
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    feats = F.concat(uni, bi) if bigrams else uni
    return toked.select(F.col(id_col), F.explode(feats).alias("bucket"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    bigrams: bool = True,
) -> DataFrame:
    """Importance weight of every ``raw`` document: ``(id_col, n_feats,
    llr_bits)`` with ``llr_bits`` the summed per-occurrence log-likelihood
    ratio in whole bits (positive ⇒ more target-like than raw-like).
    Documents with zero features are absent (their LLR is vacuous).

    One merged broadcast model table (full outer join of the two ≤
    n_buckets count tables + the two 1-row totals) keeps scoring to a
    single broadcast join regardless of corpus size."""
    raw_feats = doc_features(raw, id_col, text_col, n_buckets, salt, bigrams)
    tgt_feats = doc_features(target, id_col, text_col, n_buckets, salt, bigrams)
    # both count tables in ONE map-side-combined agg over a tagged union —
    # a full-outer join of the two count tables would sort-merge; this is
    # joinless and the side tag folds into the partial aggregates
    model = (
        raw_feats.select("bucket", F.lit(1).alias("is_raw"))
        .unionByName(tgt_feats.select("bucket", F.lit(0).alias("is_raw")))
        .groupBy("bucket")
        .agg(
            F.sum("is_raw").alias("cnt_r"),
            F.sum(F.lit(1) - F.col("is_raw")).alias("cnt_t"),
        )
    )
    totals = model.agg(
        F.coalesce(F.sum("cnt_r"), F.lit(0)).alias("total_r"),
        F.coalesce(F.sum("cnt_t"), F.lit(0)).alias("total_t"),
    )
    llr = (
        floor_log2(F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(1))
        - floor_log2(F.col("total_t") + F.lit(n_buckets))
        - floor_log2(F.coalesce(F.col("cnt_r"), F.lit(0)) + F.lit(1))
        + floor_log2(F.col("total_r") + F.lit(n_buckets))
    )
    return (
        raw_feats.join(F.broadcast(model), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, llr.alias("llr"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("llr").cast("bigint").alias("llr_bits"),
        )
    )


def dsir_select(weights: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic top-k selection by (llr_bits desc, id asc):
    TakeOrderedAndProject — never a global sort."""
    return weights.orderBy(F.desc("llr_bits"), F.asc(id_col)).limit(int(k))


def doc_features_sql(
    expr: str,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    bigrams: bool = True,
) -> str:
    """DuckDB twin of :func:`doc_features`'s feature-bucket list (shared
    bucket arithmetic via the ``functions/lm.py`` builders)."""
    uni = token_buckets_sql(expr, n_buckets, salt)
    if not bigrams:
        return uni
    toks = tokens_sql(expr)
    bi = (
        f"CASE WHEN length({toks}) >= 2 THEN "
        f"list_transform(generate_series(1, length({toks}) - 1), i -> "
        f"('0x' || substr(md5({toks}[i] || ' ' || {toks}[i + 1] || ':' || "
        f"'{salt}'), 1, {_HEX_DIGITS}))::BIGINT % {n_buckets}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    return f"list_concat({uni}, {bi})"


def dsir_oracle_cte_sql(
    target_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    bigrams: bool = True,
) -> str:
    """DuckDB twin of :func:`dsir_weights` as a CTE chain ending in
    ``weighted(id_col, n_feats, llr_bits)``. Raw = the whole ``table``;
    target = rows matching ``target_pred``."""
    feats = doc_features_sql(text_expr, n_buckets, salt, bigrams)
    fl2 = floor_log2_sql
    return f"""
raw_f AS (
  SELECT {id_col}, unnest({feats}) AS bucket FROM {table}
),
tgt_f AS (
  SELECT unnest({feats}) AS bucket FROM {table} WHERE {target_pred}
),
model AS (
  SELECT coalesce(r.bucket, t.bucket) AS bucket,
         coalesce(r.cnt_r, 0) AS cnt_r, coalesce(t.cnt_t, 0) AS cnt_t
  FROM (SELECT bucket, count(*) AS cnt_r FROM raw_f GROUP BY 1) r
  FULL OUTER JOIN
       (SELECT bucket, count(*) AS cnt_t FROM tgt_f GROUP BY 1) t
  USING (bucket)
),
tot AS (
  SELECT CAST(coalesce(sum(cnt_r), 0) AS BIGINT) AS total_r,
         CAST(coalesce(sum(cnt_t), 0) AS BIGINT) AS total_t
  FROM model
),
weighted AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(
             {fl2("coalesce(m.cnt_t, 0) + 1")}
           - {fl2(f"(SELECT total_t FROM tot) + {n_buckets}")}
           - {fl2("coalesce(m.cnt_r, 0) + 1")}
           + {fl2(f"(SELECT total_r FROM tot) + {n_buckets}")}
         ) AS BIGINT) AS llr_bits
  FROM raw_f LEFT JOIN model m USING (bucket)
  GROUP BY 1
)"""
