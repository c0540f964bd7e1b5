"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) — the
tokenizer-side operator of a training-data pipeline.

The reference engine has no tokenizer surface (PolyFuzz consumes sklearn's
analyzer, /root/reference/polyfuzz/models/_tfidf.py:100-110); this module
is a training-data-pipeline extension like ``functions/lm.py``.

Scale split — the published shape every production tokenizer trainer uses
(HuggingFace tokenizers, SentencePiece: corpus pass → word-frequency dict
→ in-memory merge loop):

* **Word counting is the corpus-scale stage** and is fully distributed:
  one map-side tokenize + one map-side-combined ``groupBy(word).count()``.
  100 TB of text collapses to its distinct-word frequency table — the
  only pass that ever touches the corpus.
* **Merge learning runs on the BOUNDED frequency table.** The table is
  capped explicitly (``min_count`` floor, then top-``max_words`` by
  (count desc, word asc) via TakeOrdered — never a global sort) and
  pulled once over Arrow, the same bounded-driver-tier contract as
  ``linkage.SMALL_GRAPH_MAX_EDGES``: by default the cap REFUSES to
  truncate (raise) rather than silently drop mass; ``allow_truncate=True``
  opts into the standard top-N practice. The merge loop itself is the
  classic Sennrich algorithm with a deterministic (count desc, pair asc)
  tie-break so training is reproducible across runs and partitionings.
* **Encoding is Arrow-batched** (``mapInPandas``): merges broadcast as a
  rank dict, each DISTINCT token in the batch encoded once via a
  per-batch memo (Zipf makes the memo hit rate ~99% on real text), greedy
  lowest-rank-first merging exactly like the reference BPE encoders.

No exact SQL twin exists for the iterative merge loop (each round's input
depends on the previous round's argmax — the same no-SQL-twin class as
the WRatio composite); the contract query for the distributed machinery is
``bpe_pair_counts`` (one merge round's pair statistics, EXACT DuckDB twin)
plus golden/property tests of the loop against an independent pure-Python
reference (``tests/test_bpe.py``).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from ..partitioning import ensure_min_partitions

MAX_WORDS_DEFAULT = 1_000_000

# end-of-word sentinel (Sennrich '16 uses </w>): lets the tokenizer learn
# that "low" at word end differs from "low" inside "lower"
EOW = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Distinct-word frequency table ``(word, cnt)`` — the corpus-scale
    stage. One explode + one map-side-combined count; the ``min_count``
    floor applies AFTER aggregation (a HAVING, pushed into the agg)."""
    wc = (
        ensure_min_partitions(df)
        .select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= F.lit(min_count))
    return wc


def merge_word_counts(
    a: DataFrame, b: DataFrame, min_count: int = 1
) -> DataFrame:
    """Incremental tokenizer-training state: word counts over disjoint
    corpora are ADDITIVE, so two snapshots' tables merge into exactly the
    joint table — `learn_bpe` over the merge learns the identical merge
    sequence a joint fit would (pinned by tests). The BPE analog of
    ``merge_hashed_lms`` / ``merge_tfidf_models``: evolve the tokenizer
    per snapshot delta without re-reading old corpora.

    Both inputs MUST be unfloored (built with ``min_count=1``): a
    min_count floor is not additive — a word below the floor in both
    halves can clear it in the union — so the floor applies HERE, after
    the sum. One union + one map-side-combined sum over two ≤|vocab|-row
    tables; nothing corpus-scale."""
    wc = (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
    )
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= F.lit(min_count))
    return wc


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def learn_bpe(
    wc: DataFrame,
    n_merges: int,
    max_words: int = MAX_WORDS_DEFAULT,
    allow_truncate: bool = False,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a word-frequency table:
    ``(rank, left, right, merged, pair_count)``, rank 0 first. The loop is
    exact Sennrich BPE with a deterministic (count desc, (left, right)
    asc) argmax tie-break. Driver-side data is the frequency table,
    bounded by ``max_words`` (refuses to truncate unless opted in)."""
    spark = wc.sparkSession
    n_words = wc.count()
    if n_words > max_words:
        if not allow_truncate:
            raise ValueError(
                f"word table has {n_words} rows > max_words={max_words}; "
                f"raise min_count, raise max_words, or pass "
                f"allow_truncate=True for top-N-by-frequency training "
                f"(the standard tokenizer-trainer practice)"
            )
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(int(max_words))
    pdf = wc.toPandas()  # bounded Arrow transfer (see module docstring)
    # indexed incremental loop (the Sennrich reference implementation's
    # fast path): per merge, only words CONTAINING the merged pair are
    # touched — O(df(pair)) instead of O(|words|) per round, the
    # difference between 50 s and <1 s for 50 merges at 165k words
    words: list[list[str]] = []
    counts: list[int] = []
    agg: dict[tuple[str, ...], int] = {}
    for w, c in zip(pdf["word"], pdf["cnt"]):
        agg[_symbols(w)] = agg.get(_symbols(w), 0) + int(c)
    for syms, c in agg.items():
        words.append(list(syms))
        counts.append(c)
    pair_counts: Counter = Counter()
    pair2words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = counts[wi]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair2words.setdefault(p, set()).add(wi)
    # lazy-deletion heap for the argmax: (-cnt, pair) entries, stale ones
    # (count moved since push) discarded at pop — O(log) per touched pair
    # instead of an O(|pairs|) scan per round. Tuple order (-cnt, pair)
    # IS the deterministic (count desc, pair asc) tie-break.
    import heapq

    heap = [(-c, p) for p, c in pair_counts.items() if c > 0]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(int(n_merges)):
        cnt = 0
        while heap:
            negc, cand = heapq.heappop(heap)
            if pair_counts.get(cand, 0) == -negc:
                a, b = cand
                cnt = -negc
                break
        if not cnt:
            break
        merges.append((rank, a, b, a + b, int(cnt)))
        merged = a + b
        touched: set[tuple[str, str]] = set()
        for wi in list(pair2words.get((a, b), ())):
            syms, c = words[wi], counts[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                touched.add(p)
                s = pair2words.get(p)
                if s is not None:
                    s.discard(wi)
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[wi] = res
            for p in zip(res, res[1:]):
                pair_counts[p] += c
                touched.add(p)
                pair2words.setdefault(p, set()).add(wi)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
        "pair_count bigint",
    )


def _encode_token(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one token (the reference
    algorithm of every BPE encoder)."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge EVERY occurrence of the chosen pair left-to-right (same
        # pass order as the training loop's _merge_vocab)
        a, b = syms[best], syms[best + 1]
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with a learned merge table: ``(id_col,
    n_tokens, n_bpe_tokens, bpe_tokens array<string>)``. Arrow-batched
    ``mapInPandas``; the merge table (≤ n_merges rows) rides into the
    closure, each distinct word per batch encoded once via a memo."""
    ranks = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }
    id_type = dict(df.dtypes)[id_col]  # don't assume long ids
    schema = (
        f"{id_col} {id_type}, n_tokens bigint, n_bpe_tokens bigint, "
        f"bpe_tokens array<string>"
    )
    toked = ensure_min_partitions(df).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )

    def enc(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, n_t, n_b, outs = [], [], [], []
            for i, ws in zip(pdf[id_col], pdf["__toks"]):
                pieces: list[str] = []
                for w in ws:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_token(w, ranks)
                    pieces.extend(got)
                ids.append(i)
                n_t.append(len(ws))
                n_b.append(len(pieces))
                outs.append(pieces)
            yield pd.DataFrame({
                id_col: ids, "n_tokens": n_t, "n_bpe_tokens": n_b,
                "bpe_tokens": outs,
            })

    return toked.mapInPandas(enc, schema)


def bpe_encode_counts(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE token counts via the JOIN route — the 100 TB shape:
    ``(id_col, n_tokens, n_bpe_tokens)``.

    Encodes each distinct word exactly ONCE across the whole cluster:
    distinct words (an agg over the corpus) → Arrow-batched encode of the
    word table → doc-word explode equi-joins the per-word piece counts
    back → one map-side-combined agg per doc. Work ∝ |distinct words| +
    |token occurrences|, independent of task count; the join broadcasts
    when the word table fits, shuffles on the word key (hash-uniform)
    otherwise — AQE decides.

    Route choice is CORPUS-DEPENDENT (measured A/B in BASELINE.md): on
    Zipf-shaped natural text (occurrences ≫ distinct words) this route
    amortizes every hot word to one encode; on identifier-heavy code
    corpora where most occurrences ARE distinct words (the 2M-doc
    synthetic corpus runs 84% distinct) there is nothing to amortize and
    ``bpe_encode``'s shuffle-free memo route wins (10.9 vs 57.5 s at 32
    threads). Decide on ``|distinct|/|occurrences|`` from the word-count
    table — it is already computed before any encode. Only counts come
    back (packing, length stats); use ``bpe_encode`` when the piece
    SEQUENCES themselves are the output."""
    ranks = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }
    toked = ensure_min_partitions(df).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )
    words = (
        toked.select(F.explode("__toks").alias("word")).distinct()
    )

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_pieces": [
                    len(_encode_token(w, ranks)) for w in pdf["word"]
                ],
            })

    pieces = words.mapInPandas(enc, "word string, n_pieces bigint")
    return (
        toked.select(F.col(id_col), F.explode("__toks").alias("word"))
        .join(pieces, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
        )
    )


def pair_counts_df(wc: DataFrame) -> DataFrame:
    """Round-0 adjacent-symbol pair statistics of a word-frequency table —
    the distributed form of ONE merge round's counting step, with an
    exact SQL twin (the iterative loop has none): ``(left, right, cnt)``
    where each word contributes its frequency to every adjacent
    (char_i, char_i+1) pair of ``chars(word) + [EOW]``. One inline
    explode + one map-side-combined sum."""
    # materialize the symbol array in its own projection — referencing the
    # chars-of-word expression inside the pair lambda would re-evaluate it
    # per element (the no-CSE-into-HOF rule, cf. operators/mapside.py)
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )
    with_syms = wc.select(F.col("cnt"), syms.alias("__s"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__s") - 1),
        lambda i: F.struct(
            F.element_at("__s", i).alias("lhs"),
            F.element_at("__s", i + F.lit(1)).alias("rhs"),
        ),
    )
    return (
        with_syms.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def pair_counts_oracle_sql(
    table: str = "documents", text_expr: str = "text", min_count: int = 1
) -> str:
    """DuckDB twin of ``word_counts`` → ``pair_counts_df``."""
    from ..functions.textstats import tokens_sql

    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    return f"""
wc AS (
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest({tokens_sql(text_expr)}) AS word FROM {table})
  GROUP BY 1 {having}
),
syms AS (
  SELECT cnt,
         list_concat(
           list_transform(generate_series(1, length(word)),
                          i -> substring(word, i, 1)),
           ['{EOW}']) AS s
  FROM wc WHERE length(word) >= 1
),
pc AS (
  SELECT p.lhs, p.rhs, CAST(sum(p.cnt) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(generate_series(1, length(s) - 1),
                  i -> {{'lhs': s[i], 'rhs': s[i + 1], 'cnt': cnt}})) AS p
    FROM syms
  )
  GROUP BY 1, 2
)"""
