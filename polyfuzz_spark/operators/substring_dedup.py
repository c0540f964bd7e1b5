"""Exact-substring (span-level) deduplication: find token spans that are
duplicated ACROSS documents and cut them out, keeping one canonical
occurrence — the ExactSubstr dedup of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022), re-expressed in the n-gram
window form that distributes.

Doc-level dedup (exact / MinHash / SimHash / Jaccard / embedding —
``operators/dedup.py``) drops whole documents; this operator handles the
complementary failure mode: two mostly-different files sharing one pasted
block (a vendored function, a license body mid-file, a copied README
section). Lee et al. remove every duplicated substring ≥ 50 BPE tokens via
a corpus-global suffix array — inherently sequential to build. The
distributed re-expression: an n-token rolling window is duplicated iff it
occurs in ≥ 2 documents; a maximal duplicated substring of length L ≥ n
is exactly a run of L − n + 1 consecutive duplicated windows, so merging
overlapping duplicated windows per document recovers the maximal
duplicated spans at n-token resolution (spans shorter than n are below
the dedup threshold by construction, as in the paper).

No reference analog (PolyFuzz matches whole short strings;
/root/reference/polyfuzz/models/_utils.py tokenizes but never positions);
this reuses the decontamination machinery's window construction
(``operators/decontam.py``) with positions kept.

Scale shape (the corpus is the 100 TB side):

* Window OCCURRENCES (id, pos, key) explode map-side off the scan — one
  row per token, 8-byte ``xxhash64`` keys on the scale path
  (``hashed=True``), never the window strings.
* The duplicated-key set comes from the per-doc DISTINCT gram table
  (``decontam.word_ngrams`` / ``gram_keys``: ``array_distinct`` map-side)
  aggregated by key with a map-side-combined count — a boilerplate window
  in millions of docs costs one reduce row, and a window repeated inside
  ONE doc never inflates its count past 1.
* Occurrences join the duplicated-key set (equi-join; AQE broadcasts when
  the dup set is small). ``keep_first`` selects the canonical occurrence
  per key with one ``min(struct(id, pos))`` aggregation — map-side
  combinable, no per-key window sort.
* Span merging is per-document: positions collect into one bounded array
  (≤ token count of the doc) and islands are computed functionally inside
  the row — no window function, no second shuffle.

A hash collision can only ADD a duplicated flag (the conservative
direction for dedup), probability ≈ n_windows²/2⁶⁵.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as TS
from ..partitioning import ensure_min_partitions

DEFAULT_SPAN_N = 13  # window length = minimum detectable span, in tokens


def window_occurrences(
    df: DataFrame,
    *,
    n: int = DEFAULT_SPAN_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """ALL token-window occurrences WITH positions: ``(id_col, pos, gram)``
    — one row per window start (1-based token index), repeats kept. The
    positional sibling of ``decontam.word_ngrams`` (which dedupes per doc
    and drops positions). ``hashed=True`` emits 8-byte ``xxhash64`` keys
    instead of window strings (column name stays ``gram``)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toked = ensure_min_partitions(df).select(
        F.col(id_col),
        TS.tokens(text_col).alias("__toks"),
    ).where(F.size("__toks") >= n)
    if hashed:
        toked = toked.select(
            F.col(id_col),
            F.transform("__toks", lambda t: F.xxhash64(t)).alias("__toks"),
        )

        def win(i: Column) -> Column:
            return F.xxhash64(F.slice("__toks", i, n))
    else:
        def win(i: Column) -> Column:
            return F.array_join(F.slice("__toks", i, n), " ")

    # same codegen-evaluation-order guard as decontam.word_ngrams: the
    # >= n predicate must also live inside the expression, or sequence()
    # runs descending on short docs
    windows = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - n + 1),
            lambda i: F.struct(i.alias("pos"), win(i).alias("gram")),
        ),
    ).otherwise(F.array().cast(
        "array<struct<pos:int,gram:" + ("bigint" if hashed else "string")
        + ">>"
    ))
    # explode the EXPRESSION inline (InferFiltersFromGenerate re-evaluates
    # materialized array builds below the shuffle — see decontam.py)
    return toked.select(
        F.col(id_col), F.explode(windows).alias("__w")
    ).select(id_col, F.col("__w.pos").alias("pos"),
             F.col("__w.gram").alias("gram"))


def duplicated_window_hits(
    df: DataFrame,
    *,
    n: int = DEFAULT_SPAN_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    keep_first: bool = True,
) -> DataFrame:
    """Window occurrences that are DUPLICATED across documents:
    ``(id_col, pos)``. A window counts as duplicated when it occurs in
    ≥ 2 distinct documents (within-doc repetition alone is a repetition
    SIGNAL — ``textstats.dup_token_frac_milli`` — not cross-doc
    duplication). With ``keep_first`` the canonical occurrence — minimum
    ``(id, pos)`` per window — is NOT a hit, so one copy of every
    duplicated span survives the cut, as in Lee et al. §4."""
    occ = window_occurrences(
        df, n=n, text_col=text_col, id_col=id_col, hashed=hashed
    )
    # per-doc-distinct gram table (map-side array_distinct) -> a window's
    # count equals its distinct-doc count; map-side-combined aggregation
    from .decontam import gram_keys, word_ngrams

    per_doc = (
        gram_keys(df, n=n, text_col=text_col, id_col=id_col)
        .withColumnRenamed("gram_key", "gram")
        if hashed
        else word_ngrams(df, n=n, text_col=text_col, id_col=id_col)
    )
    dup_keys = (
        per_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("gram")
    )
    occ_dup = occ.join(dup_keys, "gram")
    if not keep_first:
        return occ_dup.select(id_col, "pos")
    keeper = occ_dup.groupBy("gram").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__kp")
    )
    return (
        occ_dup.join(keeper, "gram")
        .where(
            (F.col(id_col) != F.col(f"__kp.{id_col}"))
            | (F.col("pos") != F.col("__kp.pos"))
        )
        .select(id_col, "pos")
    )


def duplicated_spans(
    df: DataFrame,
    *,
    n: int = DEFAULT_SPAN_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    keep_first: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document: ``(id_col, tok_start,
    tok_end)`` — 1-based inclusive token indices, overlapping/adjacent
    duplicated windows merged. A span's length is ≥ n by construction.

    The merge runs inside each row: hit positions collect into one sorted
    array (bounded by the doc's token count) and islands split where the
    gap between consecutive window starts exceeds n (equal-length windows
    make the running island end exactly ``last start + n − 1``)."""
    hits = duplicated_window_hits(
        df, n=n, text_col=text_col, id_col=id_col, hashed=hashed,
        keep_first=keep_first,
    )
    agg = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("__ps")
    )
    ps = F.col("__ps")
    idx = F.sequence(F.lit(1), F.size(ps))
    # island starts: first position, or gap from the previous start > n;
    # F.when (CaseWhen) evaluates lazily, guarding element_at(ps, 0) /
    # element_at(ps, size+1) which ANSI mode rejects
    starts_i = F.filter(
        idx,
        lambda i: F.when(i == F.lit(1), F.lit(True)).otherwise(
            F.element_at(ps, i) - F.element_at(ps, i - 1) > F.lit(n)
        ),
    )
    ends_i = F.filter(
        idx,
        lambda i: F.when(i == F.size(ps), F.lit(True)).otherwise(
            F.element_at(ps, i + 1) - F.element_at(ps, i) > F.lit(n)
        ),
    )
    spans = F.zip_with(
        starts_i,
        ends_i,
        lambda s, e: F.struct(
            F.element_at(ps, s).alias("tok_start"),
            (F.element_at(ps, e) + F.lit(n - 1)).alias("tok_end"),
        ),
    )
    return agg.select(id_col, F.explode(spans).alias("__sp")).select(
        id_col,
        F.col("__sp.tok_start").alias("tok_start"),
        F.col("__sp.tok_end").alias("tok_end"),
    )


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite documents with the given token spans removed: every input
    row survives with ``text_col`` replaced by the space-joined surviving
    tokens plus ``n_tokens_removed``. Operates on the whitespace token
    stream (the same normalization as ``operators/packing.py``) — byte
    layout between tokens is not preserved, token content is.

    One equi-join on ``id_col`` (spans collect to a bounded per-doc array;
    docs without spans pass through); the cut itself is a functional
    filter inside the row."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("tok_start"), F.col("tok_end"))
        ).alias("__sp")
    )
    joined = docs.join(sp, id_col, "left").select(
        "*", TS.tokens(text_col).alias("__toks")
    )
    covered = F.coalesce(F.col("__sp"), F.array().cast(
        "array<struct<tok_start:int,tok_end:int>>"
    ))
    # binary lambda: (element, 0-based index) — positions are 1-based
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.exists(
            covered,
            lambda s: (i + 1 >= s["tok_start"]) & (i + 1 <= s["tok_end"]),
        ),
    )
    out = [c for c in docs.columns if c != text_col]
    return joined.select(
        *out,
        F.array_join(kept, " ").alias(text_col),
        (F.size("__toks") - F.size(kept)).cast("bigint").alias(
            "n_tokens_removed"
        ),
    )


def dedup_substrings(
    docs: DataFrame,
    *,
    n: int = DEFAULT_SPAN_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
    keep_first: bool = True,
) -> DataFrame:
    """The end-to-end verb: detect duplicated spans, cut them, return the
    rewritten corpus (every row survives; duplicated text survives exactly
    once when ``keep_first``). Hashed window keys by default — the scale
    configuration; ``hashed=False`` is the audit/oracle form."""
    spans = duplicated_spans(
        docs, n=n, text_col=text_col, id_col=id_col, hashed=hashed,
        keep_first=keep_first,
    )
    return cut_spans(docs, spans, text_col=text_col, id_col=id_col)
