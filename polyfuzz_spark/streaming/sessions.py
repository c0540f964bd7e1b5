"""Stateful streaming sessionization via ``applyInPandasWithState`` — the
streaming twin of the batch gap-sessionization query
(``queries.q_user_sessions``: a new session starts after > gap seconds of
per-user silence).

State per user: the open session (start_sec, last_sec, n_events). A session
row is emitted append-once when it CLOSES — either because a later event of
the same user arrives beyond the gap, or because the event-time watermark
passes last_sec + gap (GroupStateTimeout.EventTimeTimeout). Sessions still
open when a finite ``availableNow`` drain ends stay in state (exactly the
late-data semantics of the windowed rollup in ``streaming/windows.py``);
the tests compare emitted rows bit-for-bit against the batch twin.

Out-of-order (late-but-within-watermark) events are merged, not assumed
sorted: an event inside the open session's span counts toward it, one
within ``gap_s`` before its start extends it backward, and one older than
that is emitted as its own singleton session (aggregate state cannot
reconstruct its true neighbors — exact whenever it had none).

This is the engine's UDAF-with-state surface (task brief:
``applyInPandasWithState`` for custom stateful operators); everything else
in the streaming package is stateless.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, start_sec long, end_sec long, n_events long"
)
STATE_SCHEMA = "start_sec long, last_sec long, n_events long"


def _session_fn(gap_s: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "start_sec": [start],
                 "end_sec": [last], "n_events": [n]}
            )
            return
        secs: list[int] = []
        for pdf in pdfs:
            secs.extend(int(s) for s in pdf["sec"])
        secs.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        if not secs and last is None:
            return
        closed = []
        for s in secs:
            if last is None:
                start = last = s
                n = 1
            elif s > last:
                if s - last > gap_s:
                    closed.append((start, last, n))
                    start = s
                    n = 0
                last = s
                n += 1
            elif s >= start:
                # late event INSIDE the open session (within watermark):
                # counts toward it, bounds unchanged
                n += 1
            elif start - s <= gap_s:
                # late event shortly BEFORE the open session: extends it
                # backward (the batch twin would merge them)
                start = s
                n += 1
            else:
                # older than the open session by more than the gap — a
                # definitively separate, already-over session. With only
                # aggregate state its own neighbors are gone, so it is
                # emitted as a singleton (exact when it had no neighbors;
                # the best reconstruction aggregate state allows otherwise)
                closed.append((s, s, 1))
        # close-by-watermark without waiting for the timeout callback when
        # the watermark has already passed (a timeout set in the past is an
        # error); otherwise arm the event-time timeout at last + gap
        deadline_ms = (last + gap_s) * 1000 + 1
        if deadline_ms <= state.getCurrentWatermarkMs():
            closed.append((start, last, n))
            if state.exists:
                state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(deadline_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "start_sec": [c[0] for c in closed],
                    "end_sec": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize(events: DataFrame, gap_s: int = 1800,
               watermark: str = "2 hours") -> DataFrame:
    """(user_id, start_sec, end_sec, n_events) of CLOSED sessions.
    ``events`` needs (ts: timestamp, user_id); streaming input only —
    use ``sessionize_batch`` for the batch twin."""
    e = (
        events.withWatermark("ts", watermark)
        .select("ts", "user_id", F.unix_timestamp("ts").alias("sec"))
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800,
                     include_idx: bool = False) -> DataFrame:
    """Batch twin (lag + running-sum gap split, one per-user window) — ALL
    sessions, including ones a stream would still hold open. This is the
    single definition of batch gap-sessionization: ``queries.
    q_user_sessions`` (oracle-checked) delegates here with
    ``include_idx=True``."""
    from pyspark.sql import Window

    e = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = e.withColumn(
        "new_s",
        F.when(F.col("sec") - F.lag("sec").over(w) > gap_s, 1).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agg = flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
    )
    if include_idx:
        return agg.select(
            "user_id", "session_idx", "n_events", "start_sec", "end_sec"
        )
    return agg.select("user_id", "start_sec", "end_sec", "n_events")


def stream_sessions_parquet(
    spark,
    input_dir: str,
    schema: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
):
    """File-source deployment: sessionize the event stream, append closed
    sessions exactly-once via the checkpoint (availableNow drains then
    stops). ``max_files_per_trigger`` chunks the drain into micro-batches
    so the watermark advances between them (timeouts can only fire against
    the previous batch's watermark)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    sessions = sessionize(stream, gap_s, watermark)
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
