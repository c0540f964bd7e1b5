"""Streaming LM quality gate: drop high-perplexity documents from an
incoming training-data stream at ingest.

The batch scorer (``functions/lm.py``) is a broadcast join + per-doc
aggregation; append-mode streaming can't run a plain per-doc agg without
needless state, so — exactly like ``decontam_gate.py`` — the gate runs
per MICRO-BATCH via ``foreachBatch``: the fitted LM (a ≤ n_buckets-row
DataFrame, localCheckpointed once) scores each batch with the unchanged
batch kernel, so stream == batch by construction, and the ``batch=<id>``
overwrite sink keeps replays exactly-once.

Thresholding is ABSOLUTE here (``max_bits_milli``), not tercile: a stream
has no fixed population to take terciles over. Production recipe: run the
batch ``quality_buckets`` on a bootstrap corpus, read the per-group P66.7
from its threshold table, and pass that value — then the stream drops
exactly what the batch tail-drop would have."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lm import DEFAULT_BUCKETS, bits_per_token


def stream_lm_gate(
    stream: DataFrame,
    lm: DataFrame,
    max_bits_milli: int,
    out_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "lm",
    available_now: bool = True,
):
    """Start the gate: docs scoring above ``max_bits_milli`` mean
    surprisal (and zero-token docs, whose perplexity is undefined) are
    dropped; survivors land under ``{out_dir}/batch=<batch_id>/`` with a
    ``bits_milli`` audit column. ``n_buckets``/``salt`` must match the
    LM's fit (use the save/load manifest, ``functions/lm.py``). Returns
    the StreamingQuery."""
    frozen = lm.localCheckpoint(eager=True)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        scored = bits_per_token(
            batch_df, frozen, id_col, text_col, n_buckets, salt
        ).where(F.col("bits_milli") <= F.lit(int(max_bits_milli)))
        surv = batch_df.join(
            scored.select(id_col, "bits_milli"), id_col
        )
        surv.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
