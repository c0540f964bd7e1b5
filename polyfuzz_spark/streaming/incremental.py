"""Structured Streaming surface: incremental matching of a document stream
against a fitted TF-IDF index (the reference's ``fit``/``transform`` split,
``/root/reference/polyfuzz/polyfuzz.py:209-242`` + ``_tfidf.py:108-117``,
re-expressed as a zero-shuffle streaming stage).

The reference has no streaming semantics (SURVEY.md §2.9); this is a
deliberate engine extension: at ingest scale new files arrive continuously
and must be matched against the already-resolved corpus without refitting.

Design: the fitted state (vocabulary ids, IDF vector, L2-normalized corpus
matrix) is broadcast once; each incoming Arrow batch is cleaned, shingled,
vectorized and scored with one BLAS matmul entirely inside ``mapInPandas``.
No shuffle, no stateful operator, no watermark needed — the stage is a pure
per-batch map, so the SAME code runs on a batch DataFrame and a streaming
DataFrame (Spark's unified batch/streaming contract), and stream output ==
batch output row-for-row (tested).

The Python-side clean + n-gram steps replicate operators P1/P2 exactly
(functions/normalize.py, functions/ngrams.py); transform drops
out-of-vocabulary terms BEFORE normalization, matching sklearn and the
reference's ``re_train=False`` path.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pygrams import clean_py as _clean_py
from ..functions.pygrams import grams_py as _grams_py
from ..operators.tfidf import TfidfConfig, TfidfModel

OUT_SCHEMA = "from_id long, to_id long, sim_milli long, rnk int"


@dataclass
class TfidfIndex:
    """Driver-side fitted state, broadcast to the streaming kernel.

    ``vpack`` (sorted uint64 gram keys, tid of each) is the whole-batch
    vectorizer's vocabulary lookup, precomputed by ``build_index`` whenever
    the batched-kernel precondition holds (cleaned text, n-grams ≤ 8
    bytes — the same dispatch as ``operators/mapside.py``); None routes the
    kernels to the per-doc fallback."""

    term_to_tid: dict
    idf: np.ndarray          # (dim,)
    to_ids: np.ndarray       # (n_to,)
    to_mat: np.ndarray       # (n_to, dim) L2-normalized tf-idf rows
    config: TfidfConfig
    vpack: tuple | None = None


def _vectorize_py(key: str, term_to_tid: dict, idf: np.ndarray,
                  cfg: TfidfConfig) -> np.ndarray | None:
    s = _clean_py(key) if cfg.clean_string else key
    tids = [term_to_tid.get(g) for g in _grams_py(s, cfg)]
    tids = [t for t in tids if t is not None]  # OOV dropped pre-norm
    if not tids:
        return None
    v = np.zeros(len(idf))
    np.add.at(v, tids, 1.0)
    v *= idf
    nrm = float(np.sqrt((v * v).sum()))
    return v / nrm if nrm > 0 else None


def _vectorize_rows(keys: list, ix: TfidfIndex) -> tuple[np.ndarray, np.ndarray]:
    """(kept row positions, (k, dim) L2-normalized query matrix) for one
    Arrow batch — the serving-side twin of ``mapside.
    vectorize_packed_mapside``'s dispatch (VERDICT r02 item 2: the per-doc
    Python loop was a needless constant factor on the ingest hot path;
    the whole-batch kernel measured 2.3× faster on the batch side).

    Batched route (``ix.vpack`` present): one ``_iter_gram_windows`` pass
    over the packed batch buffer, vocabulary lookup via searchsorted,
    counts accumulated straight into the dense matrix — value-identical to
    the per-doc path (same integer counts × idf, same full-row L2 norm).
    Rows with no in-vocabulary grams are dropped (OOV before norm)."""
    dim = len(ix.idf)
    if ix.vpack is not None:
        from ..operators.mapside import _iter_gram_windows

        vk, vtid = ix.vpack
        parts = list(_iter_gram_windows(keys, ix.config))
        if parts:
            doc_of = np.concatenate([p[0] for p in parts])
            g = np.concatenate([p[1] for p in parts])
            pos = np.searchsorted(vk, g)
            in_r = pos < vk.size
            ok = in_r.copy()
            ok[in_r] = vk[pos[in_r]] == g[in_r]
            d, p = doc_of[ok], pos[ok]
            # per-(doc, tid) tf counts via one sort + run lengths, then ONE
            # scatter into the kept-rows matrix — never a full-matrix
            # multiply/sum pass (dense passes made the first cut of this
            # kernel 2.3x SLOWER than the per-doc loop; this shape is the
            # measured-fast one, same as mapside.vectorize_packed_mapside)
            flat = d.astype(np.int64) * dim + vtid[p]
            flat.sort(kind="stable")
            run = np.ones(flat.size, dtype=bool)
            run[1:] = flat[1:] != flat[:-1]
            starts = np.nonzero(run)[0]
            if starts.size:
                cnt = np.diff(np.append(starts, flat.size)).astype(np.float64)
                ku = flat[run]
                tid_u = ku % dim
                d_u = ku // dim
                w = cnt * ix.idf[tid_u]
                nrm2 = np.bincount(d_u, weights=w * w, minlength=len(keys))
                kept = np.nonzero(nrm2 > 0)[0]
                rank = np.full(len(keys), -1, dtype=np.int64)
                rank[kept] = np.arange(len(kept))
                V = np.zeros((len(kept), dim))
                V[rank[d_u], tid_u] = w / np.sqrt(nrm2[d_u])
                return kept, V
        return np.empty(0, dtype=np.int64), np.empty((0, dim))
    vecs, kept = [], []
    for i, key in enumerate(keys):
        v = _vectorize_py(key or "", ix.term_to_tid, ix.idf, ix.config)
        if v is not None:
            vecs.append(v)
            kept.append(i)
    if not vecs:
        return np.empty(0, dtype=np.int64), np.empty((0, dim))
    return np.asarray(kept, dtype=np.int64), np.vstack(vecs)


def build_index(model: TfidfModel, to_vec: DataFrame,
                id_col: str = "doc_id") -> TfidfIndex:
    """Materialize fitted state from the relational model: the IDF dimension
    table + the vectorized to-side (operators/tfidf outputs). The to-side
    must be broadcast-sized — same precondition as any broadcast join,
    enforced via the shared ``fits_broadcast`` budget (gate BEFORE the
    collects; an over-budget serving corpus must take the blocked matcher
    path, not OOM the driver)."""
    from ..operators.dense_cosine import fits_broadcast

    dim = model.idf.count()
    n_to = to_vec.select(id_col).distinct().count()
    if not fits_broadcast(n_to, dim):
        raise ValueError(
            f"to-side ({n_to} docs x {dim} terms) exceeds the broadcast "
            "budget for a streaming serving index; match against the "
            "corpus with the blocked path (operators.adaptive."
            "tfidf_transform_topk) instead"
        )
    idf_rows = sorted(model.idf.collect(), key=lambda r: r["term"])
    term_to_tid = {r["term"]: i for i, r in enumerate(idf_rows)}
    idf = np.array([r["idf"] for r in idf_rows])
    by_doc: dict = {}
    for r in to_vec.select(id_col, "term", "weight").collect():
        by_doc.setdefault(r[id_col], []).append((term_to_tid[r["term"]],
                                                 r["weight"]))
    to_ids = np.array(sorted(by_doc), dtype=np.int64)
    to_mat = np.zeros((len(to_ids), len(idf)))
    for i, d in enumerate(to_ids):
        for tid, w in by_doc[d]:
            to_mat[i, tid] = w
    cfg = model.config
    vpack = None
    terms = [r["term"] for r in idf_rows]
    if (
        cfg.clean_string
        and cfg.n_gram_range[1] <= 8
        and all(len(t.encode("utf-8")) <= 8 for t in terms)
    ):
        from ..operators.mapside import _pack_grams_u64

        vkeys = _pack_grams_u64(terms)  # index i IS tid (sorted-term order)
        order = np.argsort(vkeys)
        vpack = (vkeys[order], order.astype(np.int64))
    return TfidfIndex(term_to_tid, idf, to_ids, to_mat, cfg, vpack)


def incremental_match(
    docs: DataFrame,
    index: TfidfIndex,
    top_n: int = 1,
    min_similarity: float = 0.0,
    key_col: str = "key",
    id_col: str = "doc_id",
) -> DataFrame:
    """(from_id, to_id, sim_milli, rnk) for each incoming document vs the
    fitted corpus. ``docs`` may be a batch OR streaming DataFrame — the plan
    is a stateless mapInPandas either way."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(index)
    min_milli = int(np.floor(round(min_similarity, 3) * 1000 + 0.5))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ix: TfidfIndex = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            rows_f, rows_t, rows_s, rows_r = [], [], [], []
            pos, mat = _vectorize_rows(list(pdf[key_col]), ix)
            # empty-index guard (ADVICE r02): a zero-row serving corpus
            # yields no matches, not a degenerate matmul
            if len(pos) and len(ix.to_mat):
                ids = pdf[id_col].to_numpy()[pos]
                sims = mat @ ix.to_mat.T
                milli = np.floor(np.round(sims, 3) * 1000 + 0.5).astype(
                    np.int64
                )
                for i, did in enumerate(ids):
                    row = milli[i]
                    ok = np.nonzero(row >= min_milli)[0]
                    order = ok[np.lexsort((ix.to_ids[ok], -row[ok]))][:top_n]
                    rows_f.extend([did] * len(order))
                    rows_t.extend(ix.to_ids[order])
                    rows_s.extend(row[order])
                    rows_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"from_id": rows_f, "to_id": rows_t, "sim_milli": rows_s,
                 "rnk": rows_r}
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(key_col).alias(key_col)
    ).mapInPandas(gen, schema=OUT_SCHEMA)


def stream_match_parquet(
    spark,
    input_dir: str,
    schema: str,
    index: TfidfIndex,
    output_dir: str,
    checkpoint_dir: str,
    top_n: int = 1,
    min_similarity: float = 0.0,
    key_col: str = "key",
):
    """File-source streaming deployment: watch ``input_dir`` for new parquet
    files, match each micro-batch against the fitted index, append results
    to ``output_dir`` exactly-once via the checkpoint. Returns the query
    (call ``.awaitTermination()``; ``availableNow`` drains then stops)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    matched = incremental_match(
        stream, index, top_n, min_similarity, key_col=key_col
    )
    return (
        matched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


ADMIT_SCHEMA = "doc_id long, key string, best_sim_milli long, admitted boolean"


def admission_filter(
    docs: DataFrame,
    index: TfidfIndex,
    threshold: float = 0.8,
    key_col: str = "key",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup admission screening at ingest: one verdict row PER incoming
    document — ``admitted`` is False when its best TF-IDF cosine against
    the fitted corpus reaches ``threshold`` (the training-data "don't
    re-admit what the resolved corpus already contains" gate).

    Stateless like ``incremental_match`` (per-row verdicts need no
    cross-row state, so the SAME plan runs on batch and streaming
    DataFrames with no watermark); documents that vectorize to nothing
    (no in-vocabulary n-grams) score 0 and are admitted."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(index)
    thr_milli = int(np.floor(round(threshold, 3) * 1000 + 0.5))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ix: TfidfIndex = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            best = np.zeros(len(pdf), dtype=np.int64)
            keys = list(pdf[key_col])
            pos, mat = _vectorize_rows(keys, ix)
            # empty-index guard (ADVICE r02): with zero corpus rows,
            # max(axis=1) over a (k, 0) matmul raises — score 0, admit all
            if len(pos) and len(ix.to_mat):
                sims = mat @ ix.to_mat.T
                milli = np.floor(np.round(sims, 3) * 1000 + 0.5).astype(
                    np.int64
                )
                best[pos] = milli.max(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "key": keys,
                    "best_sim_milli": best,
                    "admitted": best < thr_milli,
                }
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(key_col).alias(key_col)
    ).mapInPandas(gen, schema=ADMIT_SCHEMA)
