"""Stateful streaming exact deduplication via ``applyInPandasWithState`` —
the streaming twin of the batch exact-dedup operator
(``operators/dedup.py``): a training-data ingest stream must admit each
distinct document content exactly once across ALL micro-batches.

Design (scale-first): the content hash is computed JVM-side
(``F.sha2(text, 256)``) before the state shuffle, so grouping is on a
uniform 64-hex key — no skew, map-side nothing to combine, and the state
store holds exactly ONE tiny row (the winning doc_id) per distinct hash.
A row is emitted append-once the first time its hash is seen; any later
arrival of the same content — same micro-batch or a later one — is
dropped through state. No timeout is set: exact-dedup state is permanent
by definition (at cluster scale the RocksDB state-store provider keeps it
off-heap per partition; a TTL would bound it where the dedup window is
finite).

Winner rule: min ``doc_id`` within the FIRST micro-batch that carries the
hash. Under ordered ingest (files drained oldest-first, ``availableNow`` +
``maxFilesPerTrigger``) this equals the batch twin's global min-doc_id
survivor; the tests pin stream == batch parity, cross-batch dropping, and
exactly-once resume from the checkpoint.

Reference tie-in: PolyFuzz has no streaming semantics (SURVEY.md §2.9);
this extends its exact-duplicate grouping (the degenerate similarity == 1
case of ``match`` + ``group``) to continuous ingest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "sha string, doc_id long, text string"
STATE_SCHEMA = "doc_id long"


def _dedup_fn(key: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    sha = key[0]
    batch = [pdf for pdf in pdfs if len(pdf)]
    if state.exists or not batch:
        # hash already admitted in an earlier micro-batch (or spurious
        # empty group): drop everything
        return
    pdf = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
    win = pdf.loc[[pdf["doc_id"].idxmin()]]
    state.update((int(win["doc_id"].iloc[0]),))
    yield pd.DataFrame(
        {
            "sha": [sha],
            "doc_id": win["doc_id"].values,
            "text": win["text"].values,
        }
    )


def dedup_stream(docs: DataFrame) -> DataFrame:
    """(sha, doc_id, text) — first-seen row per distinct content.
    ``docs`` needs (doc_id: long, text: string); streaming input only —
    use ``dedup_batch`` for the batch twin."""
    hashed = docs.select(
        F.sha2(F.col("text"), 256).alias("sha"), "doc_id", "text"
    )
    return hashed.groupBy("sha").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_batch(docs: DataFrame) -> DataFrame:
    """Batch twin: global min-doc_id survivor per content hash. One
    hash-partitioned window on the uniform sha key (no skew); identical
    output contract to the drained stream under ordered ingest."""
    from pyspark.sql import Window

    hashed = docs.select(
        F.sha2(F.col("text"), 256).alias("sha"), "doc_id", "text"
    )
    w = Window.partitionBy("sha").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("sha", "doc_id", "text")
    )


def stream_dedup_parquet(
    spark,
    input_dir: str,
    schema: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """File-source deployment: dedup the document stream, append survivors
    exactly-once via the checkpoint (``availableNow`` drains then stops)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    survivors = dedup_stream(stream)
    return (
        survivors.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
