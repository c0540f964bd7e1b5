"""Multi-format corpus ingestion (operator S1-S3 surface beyond parquet).

The reference ingests Python lists and HTTP CSV datasets
(``/root/reference/polyfuzz/datasets/_load_data.py:6-40``); at engine scale
the corpus arrives as files — parquet/Iceberg normally, CSV or JSONL from
upstream exports. ``read_corpus`` normalizes any of them to the canonical
input_hint table::

    corpus(doc_id, repo, path, commit, lang, content, content_sha256)

Spark-first shape: one ``spark.read`` with an EXPLICIT schema (never
inferSchema — a second full scan at corpus scale), column projection pushed
to the scan, ``doc_id`` content-derived (``xxhash64(repo, path, commit)`` —
deterministic under any partitioning, no ``monotonically_increasing_id``),
and the sha256 lineage column computed at ingest when the source lacks it.
Validation failures (missing columns) raise before any job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUIRED = ("repo", "path", "commit", "lang", "content")

_READ_OPTS = {
    # whitespace is significant in code content — never trim (the CSV
    # WRITER trims leading whitespace by default too: exporters must write
    # with ignoreLeading/TrailingWhiteSpace=false, as the tests do)
    "csv": {
        "header": "true",
        "multiLine": "true",
        "escape": '"',
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
    },
    "json": {},       # JSON Lines
    "parquet": {},
}


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    key_col: str = "content",
) -> DataFrame:
    """Canonical corpus DataFrame from a parquet / CSV / JSONL path.

    * schema errors surface eagerly (missing required columns raise
      ValueError naming them);
    * ``doc_id`` is reused when present, else derived as
      ``xxhash64(repo, path, commit)``;
    * ``content_sha256`` is reused when present (and later enforced by
      ``assert_sha256_invariant``), else computed here — either way every
      downstream checkpoint can assert the per-row invariant.
    """
    fmt = fmt.lower()
    if fmt not in _READ_OPTS:
        raise ValueError(
            f"unsupported corpus format {fmt!r}; one of {sorted(_READ_OPTS)}"
        )
    reader = spark.read.format(fmt)
    for k, v in _READ_OPTS[fmt].items():
        reader = reader.option(k, v)
    if fmt == "csv":
        # all canonical columns are strings (doc_id cast below) — keep
        # inferSchema off so ingestion is a single scan
        reader = reader.option("inferSchema", "false")
    df = reader.load(source)
    missing = [c for c in REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus at {source!r} is missing required columns {missing}; "
            f"need {list(REQUIRED)}"
        )
    cols = [F.col(c) for c in REQUIRED]
    if "doc_id" in df.columns:
        doc_id = F.col("doc_id").cast("long")
    else:
        doc_id = F.xxhash64("repo", "path", "commit")
    if "content_sha256" in df.columns:
        sha = F.col("content_sha256")
    else:
        sha = F.sha2(F.col(key_col), 256)
    return df.select(
        doc_id.alias("doc_id"),
        *cols,
        sha.alias("content_sha256"),
    )
