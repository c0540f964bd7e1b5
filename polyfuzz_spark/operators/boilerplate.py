"""Line-level boilerplate removal: strip lines that repeat across many
documents (license headers, codegen banners, nav chrome).

The CCNet / RefinedWeb-style line dedup step of a training-data pipeline:
a line whose trimmed text appears in ≥ ``min_docs`` DISTINCT documents is
boilerplate; stripping it per-document (preserving the order of surviving
lines) removes bulk repetition that document-level dedup cannot see.

No reference analog (PolyFuzz matches whole strings); shares the corpus
data model of the dedup family (operators/dedup.py).

Scale shape:

* line table = one posexplode per doc — map-side, bounded by doc length.
* the hot-line set is ONE map-side-combined aggregation over (line →
  distinct doc count); by definition boilerplate has high document
  frequency, so the output set is small relative to the corpus and the
  strip join's build side stays broadcast-sized (AQE decides — no hint).
* reassembly is a per-doc aggregation (collect surviving (pos, line),
  sort, join) — keyed by doc id, map-side combinable, no skew beyond
  document length itself.
* ``min_chars`` keeps short/empty lines (blank separators, lone braces)
  out of the hot set — they repeat everywhere but carry structure, not
  boilerplate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_DOCS = 100
DEFAULT_MIN_CHARS = 4


def line_table(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, pos, line)`` — one row per line per doc, 0-based pos."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(
    df: DataFrame,
    *,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_chars: int = DEFAULT_MIN_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct ``line`` values whose trimmed text is ≥ ``min_chars`` long
    and which appear in ≥ ``min_docs`` distinct documents."""
    lines = line_table(df, text_col=text_col, id_col=id_col)
    return (
        lines.where(F.length(F.trim("line")) >= min_chars)
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("line")
    )


def strip_boilerplate(
    df: DataFrame,
    *,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_chars: int = DEFAULT_MIN_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, text_col, n_lines_removed)`` — each document with its
    boilerplate lines removed, surviving lines re-joined in original
    order. Documents reconstruct byte-identically when nothing is hot."""
    hot = boilerplate_lines(
        df, min_docs=min_docs, min_chars=min_chars,
        text_col=text_col, id_col=id_col,
    ).withColumn("__hot", F.lit(True))
    lines = line_table(df, text_col=text_col, id_col=id_col)
    marked = lines.join(hot, "line", "left")
    kept = F.when(
        F.col("__hot").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["line"]
            ),
            "\n",
        ).alias(text_col),
        F.count(F.col("__hot")).cast("bigint").alias("n_lines_removed"),
    )
