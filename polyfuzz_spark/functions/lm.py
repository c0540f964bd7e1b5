"""Hashed count-based language-model quality scoring — the CCNet-style
perplexity-filtering stage of a training-data pipeline, in pure integer
arithmetic.

CCNet (Wenzek et al., LREC 2020) ranks every document by the perplexity of
a language model trained on a trusted reference corpus and keeps the
low-perplexity "head"/"middle" terciles. The reference engine (PolyFuzz)
has no LM surface; this module is an engine extension in the spirit of
``operators/dedup.py``, sized for the 100 TB corpus:

* **The model is a hashed unigram count table** — tokens hash into
  ``n_buckets`` (default 2^16) md5-derived buckets, so the fitted state is
  a FIXED-size table (≤ n_buckets rows) regardless of corpus size: always
  broadcastable, never a scale hazard. (CCNet ships a 5-gram KenLM; the
  from-scratch distributed form keeps the count-based family but trades
  context length for a bounded, exactly-reproducible model.)
* **Scoring is one broadcast join + one map-side-combined agg** per doc:
  explode token buckets, left-join the broadcast count table, average the
  per-token surprisal. No shuffle touches the corpus except the per-doc
  agg keyed by the doc id (uniform by construction).
Reference parity note: PolyFuzz has no LM or quality-scoring surface
(its closest notion is the cosine similarity threshold,
/root/reference/polyfuzz/models/_utils.py:119-123); this module extends
the engine the way CCNet extends a crawl pipeline.

* **Surprisal is measured in whole bits via EXACT integer floor(log2)** —
  ``floor_log2(x)`` = length of the binary representation minus one,
  computed as a string length in both engines (Spark ``conv(x, 10, 2)``,
  DuckDB ``format('{:b}', x)``). No ``ln``/``log`` double crosses an
  engine boundary, so the DuckDB oracle hash-matches bit-for-bit — the
  same design rule as ``operators/quantiles.py``. Per-token surprisal
  with add-one smoothing::

      bits(t) = floor_log2(total + n_buckets) - floor_log2(cnt[bucket(t)] + 1)

  an integer in [0, floor_log2(total + n_buckets)]; the per-doc score
  averages it in milli-bits (integer ``div``), so whole-bit token
  quantization washes out over the document. Monotone in the true
  -log2 p within one bit per token — exactly what a head/middle/tail
  bucketing needs (CCNet cuts on terciles, not on absolute perplexity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _DENOM, _HEX_DIGITS  # shared 48-bit md5 primitive
from .textstats import tokens, tokens_sql

DEFAULT_BUCKETS = 1 << 16


def floor_log2(col: Column) -> Column:
    """Exact ``floor(log2(x))`` for integer ``x >= 1``: one less than the
    binary digit count. String-based on purpose — no double ``log`` whose
    last-ulp could differ between engines at a floor boundary."""
    return (F.length(F.conv(col.cast("string"), 10, 2)) - 1).cast("bigint")


def floor_log2_sql(expr: str) -> str:
    """DuckDB twin of :func:`floor_log2` (fmt-style binary format; the
    BIGINT cast matters — fmt rejects HUGEINT, which DuckDB sums
    produce)."""
    return f"(length(format('{{:b}}', CAST({expr} AS BIGINT))) - 1)"


def token_buckets(
    col: Column | str, n_buckets: int = DEFAULT_BUCKETS, salt: str = "lm"
) -> Column:
    """Whitespace tokens of ``col`` hashed to md5-derived bucket ids
    (``array<bigint>``, values in [0, n_buckets)). Same 12-hex md5 slice
    as ``sampling.deterministic_uniform`` — engine-portable, salt-able."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        tokens(c),
        lambda t: F.conv(
            F.substring(F.md5(F.concat_ws(":", t, F.lit(salt))), 1, _HEX_DIGITS),
            16,
            10,
        ).cast("bigint")
        % F.lit(n_buckets),
    )


def token_buckets_sql(
    expr: str, n_buckets: int = DEFAULT_BUCKETS, salt: str = "lm"
) -> str:
    """DuckDB twin of :func:`token_buckets`."""
    return (
        f"list_transform({tokens_sql(expr)}, t -> "
        f"('0x' || substr(md5(t || ':' || '{salt}'), 1, {_HEX_DIGITS}))::BIGINT "
        f"% {n_buckets})"
    )


def train_hashed_lm(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "lm",
) -> DataFrame:
    """Fit the hashed unigram LM on ``docs`` (the trusted reference corpus
    in a CCNet setup): ``(bucket, cnt, total)`` with ``total`` (the token
    count of the whole reference) replicated onto every row via a 1-row
    broadcast cross join, so the fitted model is ONE self-contained
    DataFrame — persistable with ``write.parquet`` like the snapshot index
    (`operators/snapshot.py`).

    Scale shape: one explode + one map-side-combined count to ≤ n_buckets
    rows; the 1-row total agg. Nothing touches the driver."""
    toks = docs.select(
        F.explode(token_buckets(text_col, n_buckets, salt)).alias("bucket")
    )
    counts = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("total"))
    return counts.crossJoin(F.broadcast(total))


def bits_per_token(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "lm",
) -> DataFrame:
    """Score every document of ``docs`` against a fitted hashed LM:
    ``(id_col, n_tokens, bits_milli)`` where ``bits_milli`` is the mean
    per-token surprisal in milli-bits (integer ``div``; lower = more like
    the reference corpus — CCNet's "head"). Documents with zero tokens are
    absent (their perplexity is undefined).

    ``salt``/``n_buckets`` MUST match the training call — they are part of
    the model identity, like the frozen-knob manifest of the snapshot
    index. Plan shape: map-side explode → broadcast left join (≤ n_buckets
    build rows) → one agg keyed by the doc id."""
    tok = docs.select(
        F.col(id_col),
        F.explode(token_buckets(text_col, n_buckets, salt)).alias("bucket"),
    )
    model = F.broadcast(lm.select("bucket", "cnt"))
    # coalesce: an EMPTY lm (fit on an empty reference) has no rows to
    # take max over; every token then scores the max surprisal fl2(nb)
    total = F.broadcast(
        lm.agg(F.coalesce(F.max("total"), F.lit(0)).alias("total"))
    )
    sur = floor_log2(F.col("total") + F.lit(n_buckets)) - floor_log2(
        F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)
    )
    return (
        tok.join(model, "bucket", "left")
        .crossJoin(total)
        .select(id_col, sur.alias("bits"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("(1000 * sum(bits)) div count(1)").alias("bits_milli"),
        )
    )


def lm_score_cte_sql(
    train_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "lm",
) -> str:
    """DuckDB twin of ``train_hashed_lm`` + ``bits_per_token`` as a CTE
    chain ending in ``scored(id_col, n_tokens, bits_milli)``. ``train_pred``
    selects the reference subset (e.g. the shared md5 predicate from
    ``sampling.sample_oracle_predicate``); the scored side is the whole
    table. Shared builders keep the bucket/surprisal arithmetic from
    drifting between engines."""
    buckets = token_buckets_sql(text_expr, n_buckets, salt)
    b_tot = floor_log2_sql(f"(SELECT total FROM tot) + {n_buckets}")
    b_cnt = floor_log2_sql("coalesce(lm.cnt, 0) + 1")
    return f"""
ref_tok AS (
  SELECT unnest({buckets}) AS bucket FROM {table} WHERE {train_pred}
),
lm AS (SELECT bucket, count(*) AS cnt FROM ref_tok GROUP BY 1),
tot AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS total FROM lm),
doc_tok AS (
  SELECT {id_col}, unnest({buckets}) AS bucket FROM {table}
),
scored AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST((1000 * sum({b_tot} - {b_cnt})) // count(*) AS BIGINT)
           AS bits_milli
  FROM doc_tok LEFT JOIN lm USING (bucket)
  GROUP BY 1
)"""


def merge_hashed_lms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two fitted hashed LMs into one (count tables add; totals
    add) — the incremental-evolution verb mirroring
    ``snapshot.append_to_snapshot_index``: fit a small LM on the NEW
    batch only and merge, never re-reading the standing corpus. Both
    models MUST share n_buckets/salt (the save/load manifest carries
    them); bucket arithmetic makes the merge a union + one map-side-
    combined agg over ≤ 2·n_buckets rows."""
    ta = a.agg(F.coalesce(F.max("total"), F.lit(0)).alias("t"))
    tb = b.agg(F.coalesce(F.max("total"), F.lit(0)).alias("t"))
    total = F.broadcast(
        ta.crossJoin(tb.withColumnRenamed("t", "t2")).select(
            (F.col("t") + F.col("t2")).alias("total")
        )
    )
    return (
        a.select("bucket", "cnt")
        .unionByName(b.select("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .crossJoin(total)
    )


def save_hashed_lm(
    lm: DataFrame,
    path: str,
    n_buckets: int,
    salt: str,
) -> dict:
    """Persist a fitted hashed LM: ``{path}/counts.parquet`` (the ≤
    n_buckets count table) + ``{path}/manifest.json`` with the FROZEN
    model-identity knobs — scoring with a different salt or bucket count
    silently hashes tokens into a foreign space, so the knobs travel with
    the model (the same contract as ``operators/snapshot.py``'s index
    manifest). Returns the manifest dict."""
    import json
    from pathlib import Path

    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    lm.write.mode("overwrite").parquet(str(p / "counts.parquet"))
    mf = {"kind": "hashed_unigram_lm", "n_buckets": int(n_buckets),
          "salt": salt, "version": 1}
    with open(p / "manifest.json", "w") as fh:
        json.dump(mf, fh, indent=1)
    return mf


def load_hashed_lm(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a persisted hashed LM: ``(count table, manifest)``. Pass the
    manifest's ``n_buckets``/``salt`` to :func:`bits_per_token` — the
    manifest IS the model identity."""
    import json
    from pathlib import Path

    p = Path(path)
    with open(p / "manifest.json") as fh:
        mf = json.load(fh)
    if mf.get("kind") != "hashed_unigram_lm":
        raise ValueError(f"{path} is not a hashed LM artifact: {mf}")
    return spark.read.parquet(str(p / "counts.parquet")), mf


def quality_buckets(
    scored: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail assignment: per-``group_col`` terciles of
    ``bits_milli`` (P33.3 / P66.7 via the exact bounded-histogram quantile,
    ``operators/quantiles.py`` — no per-group sort of raw rows), then each
    document tagged by comparing its score to its group's thresholds.
    Lower surprisal = ``head``. Returns ``(id_col, group_col, bits_milli,
    bucket)``.

    Scale shape: the corpus collapses to a (group, bits_milli) histogram
    (bounded: milli-bit scores of a count LM span a few thousand distinct
    values); thresholds are a ≤ groups×2-row broadcast join back."""
    from ..operators.quantiles import grouped_exact_quantiles

    qs = grouped_exact_quantiles(scored, group_col, "bits_milli", [333, 667])
    thresholds = (
        qs.groupBy(F.col(group_col))
        .agg(
            F.max(F.when(F.col("p_milli") == 333, F.col("value"))).alias("t1"),
            F.max(F.when(F.col("p_milli") == 667, F.col("value"))).alias("t2"),
        )
    )
    return scored.join(F.broadcast(thresholds), group_col).select(
        id_col,
        group_col,
        "bits_milli",
        F.when(F.col("bits_milli") <= F.col("t1"), F.lit("head"))
        .when(F.col("bits_milli") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
