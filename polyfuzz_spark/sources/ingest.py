"""Multi-format corpus ingestion (operator S1-S3 surface beyond parquet).

The reference ingests Python lists and HTTP CSV datasets
(``/root/reference/polyfuzz/datasets/_load_data.py:6-40``); at engine scale
the corpus arrives as files — parquet/Iceberg normally, CSV or JSONL from
upstream exports. ``read_corpus`` normalizes any of them to the canonical
input_hint table::

    corpus(doc_id, repo, path, commit, lang, content, content_sha256)

Spark-first shape: one ``spark.read`` with an EXPLICIT schema (never
inferSchema — a second full scan at corpus scale), column projection pushed
to the scan, ``doc_id`` content-derived (``content_id128(repo, path,
commit)`` — a 128-bit two-lane xxhash64 struct, deterministic under any
partitioning, no ``monotonically_increasing_id``, collision-safe at the
10^12-file target),
and the sha256 lineage column computed at ingest when the source lacks it.
Validation failures (missing columns) raise before any job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import content_id128

REQUIRED = ("repo", "path", "commit", "lang", "content")

_READ_OPTS = {
    # whitespace is significant in code content — never trim (the CSV
    # WRITER trims leading whitespace by default too: exporters must write
    # with ignoreLeading/TrailingWhiteSpace=false, as the tests do).
    # null vs empty string: Spark's CSV defaults map an empty field back to
    # null, silently corrupting EMPTY documents (common in real repos —
    # sha2(null) nulls the lineage column). The reader pins a
    # distinguishable pair — nullValue "\\N", emptyValue "" — and the
    # documented writer recipe is the mirror image:
    #   .option("nullValue", "\\N").option("emptyValue", '""')
    # so '' and NULL round-trip byte-for-byte (tested with an empty-string
    # row in tests/test_ingest.py).
    "csv": {
        "header": "true",
        "multiLine": "true",
        "escape": '"',
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
        "nullValue": "\\N",
        "emptyValue": "",
    },
    "json": {},       # JSON Lines; explicit schema built from a 1-line peek
    "parquet": {},
}

# the documented CSV writer recipe (mirror of the read options above) —
# exporters and tests share it so the round-trip contract is one artifact
CSV_WRITE_OPTS = {
    "header": "true",
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\\N",
    "emptyValue": '""',
}


def _json_schema(spark: SparkSession, source: str):
    """EXPLICIT JSONL schema from a one-line driver-side peek — never
    ``spark.read.json`` inference, which is a full extra scan AND drifts
    types: an exporter writing numeric-looking repo/path/commit values
    would yield bigint columns, silently changing xxhash64-derived doc_ids
    vs the same data read from CSV/parquet (ADVICE r02). Required columns
    are pinned to string (Spark coerces bare JSON numbers to their literal
    text under a string field); ``doc_id`` takes the sampled value's type
    (long for JSON numbers, string for quoted ids — a long field would
    null out quoted values, the canonical projection casts instead)."""
    import json

    from pyspark.sql import types as T

    sample = (
        spark.read.text(source)
        .where(F.length(F.trim("value")) > 0)
        .first()
    )
    if sample is None:
        raise ValueError(f"corpus at {source!r} has no JSON lines")
    first = json.loads(sample["value"])
    missing = [c for c in REQUIRED if c not in first]
    if missing:
        raise ValueError(
            f"corpus at {source!r} is missing required columns {missing}; "
            f"need {list(REQUIRED)}"
        )
    fields = [T.StructField(c, T.StringType()) for c in REQUIRED]
    if "doc_id" in first:
        id_type = (
            T.LongType()
            if isinstance(first["doc_id"], int)
            and not isinstance(first["doc_id"], bool)
            else T.StringType()
        )
        fields.append(T.StructField("doc_id", id_type))
    if "content_sha256" in first:
        fields.append(T.StructField("content_sha256", T.StringType()))
    return T.StructType(fields)


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    key_col: str = "content",
) -> DataFrame:
    """Canonical corpus DataFrame from a parquet / CSV / JSONL path.

    * schema errors surface eagerly (missing required columns raise
      ValueError naming them);
    * ``doc_id`` is reused when present, else derived as the 128-bit
      ``content_id128(repo, path, commit)`` struct (collision-safe at
      10^12 files; see ``functions/ids.py``);
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
    elif fmt == "json":
        reader = reader.schema(_json_schema(spark, source))
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
        # 128-bit struct<h1,h2>: at the 10^12-file design target a single
        # xxhash64 id has ~n²/2⁶⁵ expected collisions — tens of thousands
        # of silent file-identity merges; two lanes make it ~1.5e-15
        # (functions/ids.py). Joins/groupBy/windows take the struct as-is.
        doc_id = content_id128("repo", "path", "commit")
    if "content_sha256" in df.columns:
        sha = F.col("content_sha256")
    else:
        sha = F.sha2(F.col(key_col), 256)
    return df.select(
        doc_id.alias("doc_id"),
        *cols,
        sha.alias("content_sha256"),
    )
