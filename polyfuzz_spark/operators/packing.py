"""Training-sequence construction: deterministic sequence packing and
sliding-window chunking.

Two verbs every LLM training-data pipeline runs after curation:

``pack_sequences``
    Assign each document a position in the concatenated token stream and
    derive which fixed-length training sequence(s) it lands in (GPT-style
    "pack then chop at ``seq_len``"). The packing ORDER is part of the
    contract: documents are ordered by ``(shard, doc_id)`` where the shard
    is an md5 hash of the id — deterministic across engines, executor
    counts, and reruns (same discipline as ``functions/sampling.py``).

    Scale shape: NO global sort and NO single-partition window over the
    corpus. The prefix sum is two-level — a per-shard cumulative sum
    (window partitioned by shard: ``n_shards``-way parallel) plus a
    shard-offset table of exactly ``n_shards`` rows (tiny aggregate,
    broadcast back). Raise ``n_shards`` with the corpus so each shard's
    sort fits an executor; the offset table stays trivially small.

``chunk_text``
    Split each document into overlapping windows of ``window`` units with
    ``overlap`` units of context (unit = whitespace token or line) — the
    chunking step of an embedding/indexing pipeline over code files, where
    a 20k-line file must become model-sized pieces without losing
    boundary context. Pure map-side explode: no shuffle, chunk count per
    doc is ``ceil((n - window) / (window - overlap)) + 1``.

The reference operates on short-string lists in one pandas process and has
no packing/chunking surface; these are engine extensions for the
training-data tier (like ``operators/dedup.py``), with exact DuckDB twins
so the driver contract can hash-check them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sampling import _DENOM, _HEX_DIGITS  # noqa: F401  (_HEX_DIGITS shared)
from ..functions.textstats import bpe_token_count, bpe_token_count_sql


def _shard(key_col: str, n_shards: int, salt: str) -> Column:
    """Deterministic shard in [0, n_shards): md5-backed like
    ``sampling.deterministic_uniform`` so the DuckDB twin is exact."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))),
            1,
            _HEX_DIGITS,
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(int(n_shards)))


def _shard_sql(key_sql: str, n_shards: int, salt: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':' || '{salt}'), "
        f"1, {_HEX_DIGITS}))::BIGINT % {int(n_shards)})"
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Map each document to its place in fixed-length training sequences.

    Documents are concatenated in ``(shard, id)`` order (shard =
    ``md5(id:salt) % n_shards``) and the stream is chopped every
    ``seq_len`` tokens. Token counts use the BPE-ish pre-tokenizer
    (``functions/textstats.bpe_token_count``). Returns one row per doc:

    - ``doc_id``, ``n_tokens``
    - ``seq_id``      — training sequence holding the doc's FIRST token
    - ``seq_offset``  — token offset of the doc within that sequence
    - ``end_seq_id``  — sequence holding the doc's LAST token (> seq_id
      when the doc straddles one or more boundaries; == seq_id for empty
      docs by convention)

    All columns are exact integers, so the DuckDB twin
    (:func:`pack_oracle_sql`) hash-matches bit-for-bit.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    t = df.select(
        F.col(id_col).alias("doc_id"),
        _shard(id_col, n_shards, salt).alias("shard"),
        bpe_token_count(F.col(text_col)).alias("n_tokens"),
    )
    # per-shard running total: n_shards-way parallel sort, never global
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("s_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    # shard offsets: n_shards rows — the one intentionally tiny window
    totals = t.groupBy("shard").agg(F.sum("n_tokens").alias("tot"))
    wo = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "shard", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("off")
    )
    out = c.join(F.broadcast(offsets), "shard")
    g = F.col("off") + F.col("s_start")
    L = int(seq_len)
    return out.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(off + s_start) DIV {L}").alias("seq_id"),
        F.pmod(g, F.lit(L)).cast("bigint").alias("seq_offset"),
        F.expr(
            f"(off + s_start + greatest(n_tokens, 1) - 1) DIV {L}"
        ).alias("end_seq_id"),
    )


def pack_oracle_sql(
    seq_len: int,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
    salt: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_sequences` — same md5 shard, same
    two-level prefix sum, same integer arithmetic."""
    shard = _shard_sql(id_col, n_shards, salt)
    ntok = bpe_token_count_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {shard} AS shard, {ntok} AS n_tokens FROM {table}
),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS s_start
  FROM t
),
o AS (
  SELECT shard,
         COALESCE(sum(sum(n_tokens)) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t GROUP BY shard
)
SELECT c.doc_id, c.n_tokens,
       CAST((o.off + c.s_start) // {int(seq_len)} AS BIGINT) AS seq_id,
       CAST((o.off + c.s_start) % {int(seq_len)} AS BIGINT) AS seq_offset,
       CAST((o.off + c.s_start + greatest(c.n_tokens, 1) - 1)
            // {int(seq_len)} AS BIGINT) AS end_seq_id
FROM c JOIN o USING (shard)
"""


def chunk_text(
    df: DataFrame,
    window: int,
    overlap: int = 0,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "token",
) -> DataFrame:
    """Split each document into overlapping windows of ``window`` units
    (``unit='token'`` splits on single spaces, ``unit='line'`` on
    newlines), consecutive chunks sharing ``overlap`` units.

    Returns ``(doc_id, chunk_id, start_unit, end_unit, n_chunk_units,
    chunk_sha256)`` — the sha256 is over the rejoined chunk text, proving
    content-exact chunking against the SQL twin without shipping the
    chunk bodies through the compare. One map-side explode; the sequence
    expression is INLINE (a materialized array fed to a generator makes
    InferFiltersFromGenerate re-evaluate the array build below any
    repartition — see ``functions/ngrams.py``).
    """
    if window <= 0 or overlap < 0 or overlap >= window:
        raise ValueError(f"need 0 <= overlap < window, got {window=} {overlap=}")
    sep = {"token": " ", "line": "\n"}[unit]
    stride = window - overlap
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), sep, -1).alias("units"),
    )
    n = F.size("units")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        (F.ceil((n - F.lit(window)) / F.lit(stride)) + 1).cast("int")
    )
    e = d.select(
        "doc_id",
        "units",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    )
    start = F.col("k").cast("bigint") * stride + 1
    end = F.least(start + window - 1, F.size("units").cast("bigint"))
    chunk = F.array_join(F.slice("units", start.cast("int"), F.lit(window)), sep)
    return e.select(
        "doc_id",
        F.col("k").cast("bigint").alias("chunk_id"),
        start.alias("start_unit"),
        end.alias("end_unit"),
        (end - start + 1).alias("n_chunk_units"),
        F.sha2(chunk, 256).alias("chunk_sha256"),
    )


def chunk_oracle_sql(
    window: int,
    overlap: int = 0,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "token",
) -> str:
    """DuckDB twin of :func:`chunk_text`: same split (trailing empties
    kept by both engines), same chunk grid, same sha256 of the rejoined
    chunk."""
    sep_sql = {"token": "' '", "line": "chr(10)"}[unit]
    stride = window - overlap
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id,
         string_split({text_col}, {sep_sql}) AS units
  FROM {table}
),
e AS (
  SELECT doc_id, units,
         unnest(generate_series(0,
             CASE WHEN len(units) <= {window} THEN 0
                  ELSE CAST(ceil((len(units) - {window}) * 1.0 / {stride})
                       AS BIGINT) END)) AS k
  FROM d
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(k * {stride} + 1 AS BIGINT) AS start_unit,
       CAST(least(k * {stride} + {window}, len(units)) AS BIGINT) AS end_unit,
       CAST(least(k * {stride} + {window}, len(units)) - k * {stride}
            AS BIGINT) AS n_chunk_units,
       sha256(array_to_string(
           list_slice(units, k * {stride} + 1, k * {stride} + {window}),
           {sep_sql})) AS chunk_sha256
FROM e
"""
