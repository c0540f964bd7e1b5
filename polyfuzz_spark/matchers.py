"""Matcher strategy objects — the engine's analog of PolyFuzz models.

Each matcher consumes/produces DataFrames:

    from_df(doc_id: long|string, key: string)
    to_df  (doc_id, key) | None          (None → self-match, diagonal excluded)
    →  matches(from_id, from_key, to_id, to_key, rank, similarity)

Reference API surface: ``/root/reference/polyfuzz/models/_base.py:6-31``
(BaseMatcher contract), ``_tfidf.py:68-117`` (TFIDF), ``_rapidfuzz.py:85-113``
(RapidFuzz), ``_distance.py:77-102`` (EditDistance), ``_embeddings.py:94-145``
(embedding cosine). Self-match semantics per ``docs/releases.md:95-118``:
single list → self-matches excluded; two identical lists → self-matches kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.cosine_join import cosine_for_candidates, sparse_cosine_pairs
from .operators.topk import attach_to_keys, top_n_matches
from .operators.tfidf import TfidfConfig, TfidfModel, fit_tfidf, vectorize


class BaseSparkMatcher:
    """Contract: ``match_df(from_df, to_df) -> matches`` (K5 plug-in point,
    reference ``_base.py:6-31``). Subclass and override ``score_pairs`` (for
    pair-scorer kernels) or the whole ``match_df`` (for vector models)."""

    type: str = "Base"

    def __init__(self, model_id: str | None = None):
        self.model_id = model_id or self.type

    def match_df(self, from_df: DataFrame, to_df: DataFrame | None = None,
                 re_train: bool = True) -> DataFrame:
        raise NotImplementedError


def _tagged(df: DataFrame, tag: str) -> DataFrame:
    return df.select(
        F.concat(F.lit(tag), F.col("doc_id").cast("string")).alias("doc_id"),
        "key",
    )


class TFIDFMatcher(BaseSparkMatcher):
    """Char n-gram TF-IDF cosine matcher (reference ``_tfidf.py``).

    ``use_blocking``: above small scale, candidate pairs come from banded
    MinHash blocking instead of the full term join; scores stay exact.
    """

    type = "TF-IDF"

    def __init__(
        self,
        n_gram_range: tuple[int, int] = (3, 3),
        clean_string: bool = True,
        min_similarity: float = 0.75,
        top_n: int = 1,
        model_id: str | None = None,
        remove_space_ngrams: bool = True,
        use_blocking: bool = False,
        blocking_conf: dict | None = None,
    ):
        super().__init__(model_id)
        self.cfg = TfidfConfig(n_gram_range, clean_string, remove_space_ngrams)
        self.min_similarity = min_similarity
        self.top_n = top_n
        self.use_blocking = use_blocking
        self.blocking_conf = blocking_conf or {}
        self.model: TfidfModel | None = None
        self.to_vec: DataFrame | None = None
        self._to_df: DataFrame | None = None

    # -- fit/transform split (reference _tfidf.py:102-118, re_train flag) --
    def _fit(self, from_df: DataFrame, to_df: DataFrame | None) -> None:
        if to_df is not None:
            fit_docs = _tagged(to_df, "t:").unionByName(_tagged(from_df, "f:"))
        else:
            fit_docs = from_df
        self.model = fit_tfidf(fit_docs, "key", self.cfg)

    def match_df(self, from_df: DataFrame, to_df: DataFrame | None = None,
                 re_train: bool = True) -> DataFrame:
        exclude_self = to_df is None
        if re_train or self.model is None:
            self._fit(from_df, to_df)
            self._to_df = to_df if to_df is not None else from_df
            self.to_vec = vectorize(self.model, self._to_df, "key")
        to_df_eff = self._to_df
        from_vec = (
            self.to_vec if (exclude_self and re_train)
            else vectorize(self.model, from_df, "key")
        )
        if self.use_blocking:
            from .operators.blocking import minhash_candidates

            cands = minhash_candidates(
                from_df, None if exclude_self else to_df_eff,
                cfg=self.cfg, **self.blocking_conf,
            )
            pairs = cosine_for_candidates(cands, from_vec, self.to_vec)
            if exclude_self:
                pairs = pairs.where(F.col("from_id") != F.col("to_id"))
        else:
            pairs = sparse_cosine_pairs(
                from_vec, self.to_vec, exclude_self=exclude_self
            )
        matches = top_n_matches(pairs, from_df, self.top_n, self.min_similarity)
        return attach_to_keys(matches, to_df_eff)


class EmbeddingMatcher(BaseSparkMatcher):
    """Embedding-cosine matcher (reference ``_embeddings.py:94-145`` — L2
    normalize then cosine). Input DataFrames carry an ``embedding``
    array<float|double> column; cosine is a JVM-side ``aggregate(zip_with(...))``
    over a pre-normalized vector — no UDF. The reference's encode step
    (Flair/SBERT/...) is a plug point: any (doc_id, key, embedding) source.
    """

    type = "Embeddings"

    def __init__(self, min_similarity: float = 0.75, top_n: int = 1,
                 model_id: str | None = None):
        super().__init__(model_id)
        self.min_similarity = min_similarity
        self.top_n = top_n

    @staticmethod
    def _normalize(df: DataFrame, tag: str) -> DataFrame:
        vec = F.col("embedding").cast("array<double>")
        norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        return df.select(
            F.col("doc_id").alias(f"{tag}_id"),
            F.transform(vec, lambda x: x / norm).alias(f"{tag}_vec"),
        )

    def match_df(self, from_df: DataFrame, to_df: DataFrame | None = None,
                 re_train: bool = True) -> DataFrame:
        exclude_self = to_df is None
        to_eff = to_df if to_df is not None else from_df
        f = self._normalize(from_df, "from")
        t = self._normalize(to_eff, "to")
        pairs = f.crossJoin(t) if not exclude_self else f.join(
            t, f["from_id"] != t["to_id"]
        )
        dot = F.aggregate(
            F.zip_with("from_vec", "to_vec", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        pairs = pairs.select("from_id", "to_id", dot.alias("sim"))
        matches = top_n_matches(pairs, from_df, self.top_n, self.min_similarity)
        return attach_to_keys(matches, to_eff)
