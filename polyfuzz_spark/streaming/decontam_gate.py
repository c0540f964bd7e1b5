"""Streaming decontamination gate: keep evaluation benchmarks OUT of an
incoming training-data stream.

The batch operator (``operators/decontam.py``) needs a per-doc aggregation
over exploded grams, which append-mode streaming can't express without
state it doesn't need — so the gate runs per MICRO-BATCH via
``foreachBatch``: each batch is a plain DataFrame, the full decontaminate
join machinery applies unchanged (stream == batch by construction), and the
sink writes each batch to its own ``batch=<id>`` directory with overwrite —
idempotent under replay, so checkpoint resume is exactly-once (the same
recipe as the exactly-once tests in ``tests/test_streaming.py``).

The static side is the EVAL set (benchmarks) — small by nature; its
distinct gram-key set is built once and localCheckpointed, so micro-batches
pay only their own gram hashing + one equi-join against a materialized
build side. At 100 TB the stream side is the big one, and its cost is
per-batch linear; nothing here grows with stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.decontam import DEFAULT_N, gram_keys


def stream_decontaminate(
    stream: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Start the gate: incoming docs sharing ANY word ``n``-gram with
    ``eval_docs`` are dropped; survivors land under
    ``{out_dir}/batch=<batch_id>/``. Returns the StreamingQuery.

    Read results with ``spark.read.parquet(out_dir)`` (the ``batch``
    partition column is appended by the layout)."""
    eval_keys = (
        gram_keys(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select("gram_key")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        hits = (
            gram_keys(batch_df, n=n, text_col=text_col, id_col=id_col)
            .join(eval_keys, "gram_key", "left_semi")
            .select(id_col)
            .distinct()
        )
        surv = batch_df.join(hits, id_col, "left_anti")
        surv.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        if available_now
        else stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
