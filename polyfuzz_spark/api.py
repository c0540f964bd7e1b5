"""PolyFuzz-shaped facade over the Spark engine.

Mirrors the reference public API (``/root/reference/polyfuzz/polyfuzz.py``):
``match / fit / transform / fit_transform / group / get_matches /
get_clusters / get_cluster_mappings / save / load`` — but every verb is a
DataFrame pipeline. List inputs are accepted for reference-parity tests and
become single-partition DataFrames; real workloads pass DataFrames.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .matchers import BaseSparkMatcher, EmbeddingMatcher, TFIDFMatcher


def lists_to_df(spark: SparkSession, strings: Iterable[str],
                n_partitions: int | None = None) -> DataFrame:
    """(doc_id, key) with doc_id = list position (parity joins are by id,
    never by row order — Spark has no row order)."""
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    return df.repartition(n_partitions) if n_partitions else df


def _default_matcher(method, top_n: int) -> BaseSparkMatcher:
    # dispatch table mirrors reference polyfuzz.py:123-152
    if isinstance(method, BaseSparkMatcher):
        return method
    if method in ("TF-IDF", "TFIDF"):
        return TFIDFMatcher(min_similarity=0, top_n=top_n)
    if method == "EditDistance":
        from .scorers.editdistance import RapidFuzzMatcher

        return RapidFuzzMatcher()
    if method == "Embeddings":
        return EmbeddingMatcher(min_similarity=0, top_n=top_n)
    raise ValueError(
        "Please choose one of: 'TF-IDF', 'EditDistance', 'Embeddings', "
        "or a BaseSparkMatcher instance"
    )


class PolyFuzzSpark:
    """Drop-in-shaped replacement for ``polyfuzz.PolyFuzz`` on Spark."""

    def __init__(self, method="TF-IDF", spark: SparkSession | None = None):
        from .session import get_spark

        self.spark = spark or get_spark()
        self.method = method
        self.matches: dict[str, DataFrame] = {}
        self.clusters: dict[str, DataFrame] = {}
        self._matchers: dict[str, BaseSparkMatcher] = {}
        self._fit_to = None

    # ------------------------------------------------------------- match
    def match(self, from_list, to_list=None, top_n: int = 1) -> "PolyFuzzSpark":
        from_df = self._as_df(from_list)
        to_df = self._as_df(to_list) if to_list is not None else None
        methods = self.method if isinstance(self.method, list) else [self.method]
        seen: dict[str, int] = {}
        for m in methods:
            matcher = _default_matcher(m, top_n)
            mid = matcher.model_id
            if mid in seen:  # id dedup, reference polyfuzz.py:486-497
                seen[mid] += 1
                mid = f"{mid}_{seen[mid]}"
            else:
                seen[mid] = 0
            self._matchers[mid] = matcher
            self.matches[mid] = matcher.match_df(from_df, to_df)
        return self

    def get_matches(self, model_id: str | None = None):
        if model_id:
            return self.matches[model_id]
        if len(self.matches) == 1:
            return next(iter(self.matches.values()))
        return self.matches

    # --------------------------------------------------------------- group
    def group(self, model=None, link_min_similarity: float = 0.75,
              group_all_strings: bool = False) -> "PolyFuzzSpark":
        """Cluster the matched To-strings (reference polyfuzz.py:331-373).

        Distinct non-null To (or From∪To when group_all_strings) →
        self-match with the grouper → edges sim > threshold → transitive
        closure (documented upgrade over the reference's order-dependent
        single pass, see operators/linkage.py) → Group column.
        """
        if not self.matches:
            raise ValueError("Make sure to run .match() first")
        from .operators.grouping import add_groups

        grouper = model or TFIDFMatcher(
            n_gram_range=(3, 3), min_similarity=link_min_similarity
        )
        for mid, matches in list(self.matches.items()):
            grouped, assignments = add_groups(
                matches, grouper, link_min_similarity, group_all_strings
            )
            self.matches[mid] = grouped
            self.clusters[mid] = assignments
        return self

    def get_clusters(self, model_id: str | None = None):
        if not self.clusters:
            raise ValueError("Make sure to run .group() first")
        if model_id:
            return self.clusters[model_id]
        if len(self.clusters) == 1:
            return next(iter(self.clusters.values()))
        return self.clusters

    # ----------------------------------------------------- fit/transform
    def fit(self, from_list, to_list=None) -> "PolyFuzzSpark":
        self.match(from_list, to_list)
        self._fit_to = to_list if to_list is not None else from_list
        return self

    def transform(self, from_list) -> dict[str, DataFrame]:
        if not self._matchers:
            raise ValueError("Make sure to run .fit() first")
        from_df = self._as_df(from_list)
        to_df = self._as_df(self._fit_to)
        out = {}
        for mid, matcher in self._matchers.items():
            out[matcher.type] = matcher.match_df(from_df, to_df, re_train=False)
        return out

    def fit_transform(self, from_list, to_list=None) -> dict[str, DataFrame]:
        self.fit(from_list, to_list)
        return self.transform(from_list)

    # ----------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        """Persist fitted state (reference polyfuzz.py:429-441 — joblib
        pickle → parquet + JSON manifest here). Saves each fitted TF-IDF
        matcher's model plus the golden to-list."""
        import json
        from pathlib import Path

        from .operators.tfidf import save_model

        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        manifest: dict = {"matchers": [], "format_version": 1}
        for mid, matcher in self._matchers.items():
            entry = {"model_id": mid, "type": matcher.type}
            if isinstance(matcher, TFIDFMatcher):
                entry["min_similarity"] = matcher.min_similarity
                entry["top_n"] = matcher.top_n
            model = getattr(matcher, "model", None)
            if model is not None:
                save_model(model, str(p / f"model_{mid}"))
                entry["model_path"] = f"model_{mid}"
            manifest["matchers"].append(entry)
        if getattr(self, "_fit_to", None) is not None:
            self._as_df(self._fit_to).write.mode("overwrite").parquet(
                str(p / "to_list")
            )
            manifest["has_to_list"] = True
        (p / "manifest.json").write_text(json.dumps(manifest))

    @classmethod
    def load(cls, path: str, spark: SparkSession | None = None
             ) -> "PolyFuzzSpark":
        """Restore a saved instance (reference polyfuzz.py:443-457); the
        fitted vocabulary/IDF is reused so transform() skips refitting."""
        import json
        from pathlib import Path

        from .operators.tfidf import load_model

        p = Path(path)
        manifest = json.loads((p / "manifest.json").read_text())
        inst = cls(spark=spark)
        methods = []
        for entry in manifest["matchers"]:
            if entry["type"] == "TF-IDF":
                matcher = TFIDFMatcher(
                    model_id=entry["model_id"],
                    min_similarity=entry.get("min_similarity", 0.75),
                    top_n=entry.get("top_n", 1),
                )
                if "model_path" in entry:
                    matcher.model = load_model(
                        inst.spark, str(p / entry["model_path"])
                    )
            else:
                matcher = _default_matcher(entry["type"], 1)
            inst._matchers[entry["model_id"]] = matcher
            methods.append(matcher)
        inst.method = methods if len(methods) > 1 else methods[0]
        if manifest.get("has_to_list"):
            to_df = inst.spark.read.parquet(str(p / "to_list"))
            inst._fit_to = to_df
            for matcher in inst._matchers.values():
                if isinstance(matcher, TFIDFMatcher) and matcher.model is not None:
                    from .operators.tfidf import vectorize

                    matcher._to_df = to_df
                    matcher.to_vec = vectorize(matcher.model, to_df, "key")
        return inst

    # ------------------------------------------------------------ helpers
    def _as_df(self, data) -> DataFrame:
        if isinstance(data, DataFrame):
            return data
        return lists_to_df(self.spark, list(data))

    def matches_pandas(self, model_id: str | None = None) -> pd.DataFrame:
        """Wide From/To/Similarity[/To_k/Similarity_k][/Group] pandas frame,
        positionally ordered by from_id — the reference output shape
        (``_utils.py:104-124``), for parity tests only."""
        df = self.get_matches(model_id)
        if isinstance(df, dict):
            raise ValueError("multiple models — pass model_id")
        pdf = df.toPandas().sort_values(["from_id", "rank"])
        has_group = "group" in pdf.columns
        base = pdf[pdf["rank"] == 1].set_index("from_id")
        out = pd.DataFrame(
            {"From": base["from_key"], "To": base["to_key"],
             "Similarity": base["similarity"]}
        )
        for r in sorted(pdf["rank"].unique()):
            if r == 1:
                continue
            extra = pdf[pdf["rank"] == r].set_index("from_id")
            out[f"To_{r}"] = extra["to_key"]
            out[f"Similarity_{r}"] = extra["similarity"]
            out[f"Similarity_{r}"] = out[f"Similarity_{r}"].fillna(0.0)
        if has_group:
            out["Group"] = base["group"]
        return out.sort_index().reset_index(drop=True)
