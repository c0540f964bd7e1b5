"""Train/eval decontamination: flag (and drop) evaluation documents that
share any word n-gram with the training corpus.

The standard contamination guard for training-data pipelines (GPT-3
appendix C / Gopher §A.5 use 13-gram overlap): an eval document that shares
even one long word n-gram with a training document has likely leaked, so it
is flagged with the shared-gram count and one piece of evidence.

No reference analog (PolyFuzz is a matcher, not a curation pipeline); this
extends the same n-gram machinery its matchers use (cf.
/root/reference/polyfuzz/models/_utils.py) to the curation step that
precedes training.

Scale shape (the 100 TB side is the TRAINING corpus; the eval side is
small):

* Each side materializes its DISTINCT (doc, gram) pairs once — explode →
  ``array_distinct`` map-side, so a doc repeating a gram contributes it
  once.
* The train side is reduced to a distinct gram SET (one map-side-combined
  aggregation) and the test side LEFT-SEMI-joins against it — an equi-join
  where the build side is deduplicated, so a boilerplate gram appearing in
  millions of training docs (license headers, codegen banners) costs ONE
  row in the join, never a pair explosion. There is no cross-doc fan-out
  anywhere.
* ``hashed=True`` shrinks the train-side shuffle to 8-byte ``xxhash64``
  keys (the right asymmetry: only the small eval side carries gram strings
  for evidence). A hash collision can only ADD a false contamination flag
  (conservative direction for decontamination) with probability ≈
  n_grams²/2⁶⁵.
* Aggregation after the semi-join is keyed by eval doc id —
  map-side combinable, bounded by the eval corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as TS
from ..partitioning import ensure_min_partitions

DEFAULT_N = 13  # the GPT-3 / Gopher decontamination window


def word_ngrams(
    df: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word n-grams per document: ``(id_col, gram)`` with one row
    per distinct gram. Docs shorter than ``n`` tokens emit nothing. Pure
    map-side (tokenize → sliding window → ``array_distinct`` → explode);
    the only data movement is whatever the caller does next."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # the explode amplifies each row ~tokens-fold BEFORE any shuffle, so a
    # narrow scan (single small file in local mode) would serialize all
    # gram construction onto one task; wide real-scale scans pass through
    toked = ensure_min_partitions(df).select(
        F.col(id_col),
        TS.tokens(text_col).alias("__toks"),
    ).where(F.size("__toks") >= n)
    # the >= n guard ALSO lives inside the expression: Spark's sequence()
    # runs DESCENDING when stop < start, so an evaluation-order surprise
    # (codegen evaluating the project before the filter predicate) would
    # otherwise hit slice(start=0) on short docs
    windows = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - n + 1),
            lambda i: F.array_join(F.slice("__toks", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # explode the EXPRESSION inline: exploding a materialized array column
    # triggers InferFiltersFromGenerate, which pushes size(...)>0 /
    # isnotnull(...) predicates below the repartition and re-evaluates the
    # whole window construction twice more on the narrow pre-shuffle side
    # (measured 12x slower at sf0.1)
    return toked.select(
        F.col(id_col), F.explode(F.array_distinct(windows)).alias("gram")
    )


def gram_keys(
    df: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct HASHED word n-gram keys per document: ``(id_col, gram_key
    bigint)`` — the scale form of :func:`word_ngrams` that never builds the
    window strings. Each token is xxhash64-hashed once, each window key is
    xxhash64 over the length-``n`` slice of token hashes, so per-token work
    is O(n) longs instead of O(n) string bytes and the shuffle rows are
    8-byte keys on BOTH sides. A collision can only ADD a contamination
    flag (the conservative direction), probability ≈ n_grams²/2⁶⁵."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toked = ensure_min_partitions(df).select(  # same explode pre-spread
        F.col(id_col),
        TS.tokens(text_col).alias("__toks"),
    ).where(F.size("__toks") >= n)
    hashed = toked.select(
        F.col(id_col),
        F.transform("__toks", lambda t: F.xxhash64(t)).alias("__h"),
    )
    windows = F.when(
        F.size("__h") >= n,  # same codegen-order guard as word_ngrams
        F.transform(
            F.sequence(F.lit(1), F.size("__h") - n + 1),
            lambda i: F.xxhash64(F.slice("__h", i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # inline explode for the same InferFiltersFromGenerate reason as above
    return hashed.select(
        F.col(id_col),
        F.explode(F.array_distinct(windows)).alias("gram_key"),
    )


def contaminated_ids(
    train: DataFrame,
    test: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contaminated eval documents by ROLLING-HASH overlap: ``(id_col,
    n_shared_grams)`` — :func:`ngram_contamination` without the evidence
    string, built entirely from :func:`gram_keys` so neither side ever
    materializes gram text. The drop path for pipelines at scale; use
    :func:`ngram_contamination` when audit evidence is wanted."""
    tr_keys = gram_keys(
        train, n=n, text_col=text_col, id_col=id_col
    ).select("gram_key").distinct()
    te_keys = gram_keys(test, n=n, text_col=text_col, id_col=id_col)
    hits = te_keys.join(tr_keys, "gram_key", "left_semi")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared_grams")
    )


def contamination_fraction(
    train: DataFrame,
    test: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    rolling: bool = True,
) -> DataFrame:
    """Graded contamination per eval doc: ``(id_col, n_grams,
    n_shared_grams, contamination_milli)`` over that doc's DISTINCT word
    n-grams — the thresholdable form of the boolean flag (PaLM/Llama-style
    "high-overlap" policies drop at e.g. ≥70% shared grams instead of ≥1).

    Same join asymmetry as :func:`contaminated_ids`: the train side is one
    distinct key set, the eval side LEFT-joins it and counts hits vs
    totals in a single map-side-combinable aggregation — no cross-doc
    fan-out. Docs shorter than ``n`` tokens have no grams and emit no row
    (same contract as the other operators here). ``rolling=False`` uses
    gram strings on both sides (the oracle-parity path; hashes can only
    ADD shared counts, probability ≈ n_grams²/2⁶⁵)."""
    if rolling:
        tr = gram_keys(train, n=n, text_col=text_col, id_col=id_col)
        te = gram_keys(test, n=n, text_col=text_col, id_col=id_col)
        key = "gram_key"
    else:
        tr = word_ngrams(train, n=n, text_col=text_col, id_col=id_col)
        te = word_ngrams(test, n=n, text_col=text_col, id_col=id_col)
        key = "gram"
    tr_keys = tr.select(key).distinct().withColumn("__hit", F.lit(1))
    marked = te.join(tr_keys, key, "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0)))
            .cast("bigint")
            .alias("n_shared_grams"),
        )
        .withColumn(
            "contamination_milli",
            F.expr("(1000 * n_shared_grams) div n_grams"),
        )
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Contaminated eval documents: one row per test doc sharing ≥1 word
    n-gram with ANY train doc — ``(id_col, n_shared_grams, evidence_gram)``
    where ``n_shared_grams`` counts the test doc's distinct leaked grams
    and ``evidence_gram`` is the lexicographically smallest one
    (deterministic). ``hashed=True`` routes the join through ``xxhash64``
    gram keys (scale path; evidence stays the true gram string, carried
    only on the small eval side)."""
    tr = word_ngrams(train, n=n, text_col=text_col, id_col=id_col)
    te = word_ngrams(test, n=n, text_col=text_col, id_col=id_col)
    key: Column = F.xxhash64("gram") if hashed else F.col("gram")
    tr_keys = tr.select(key.alias("__k")).distinct()
    te_keyed = te.select(F.col(id_col), F.col("gram"), key.alias("__k"))
    hits = te_keyed.join(tr_keys, "__k", "left_semi")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"),
        F.min("gram").alias("evidence_gram"),
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    rolling: bool = False,
) -> DataFrame:
    """The eval set with contaminated documents removed (one
    ``left_anti`` equi-join on ``id_col`` against the flagged set).
    ``rolling=True`` flags via :func:`contaminated_ids` (token-hash
    windows, no gram strings anywhere — the scale path when no audit
    evidence is needed)."""
    if rolling:
        flagged = contaminated_ids(
            train, test, n=n, text_col=text_col, id_col=id_col
        ).select(id_col)
    else:
        flagged = ngram_contamination(
            train, test, n=n, text_col=text_col, id_col=id_col, hashed=hashed
        ).select(id_col)
    return test.join(flagged, id_col, "left_anti")
