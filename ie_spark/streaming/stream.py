"""Structured Streaming ingestion of transcript turns.

The reference's streaming story is an SQS long-poll consumer with
at-least-once delivery and content-hash dedup
(``marbles/aws/__init__.py:257-365``).  Spark-native equivalent:

  readStream(file/kafka source, transcript schema)
    → extraction (same mapInPandas as batch — code shared)
    → foreachBatch: idempotent merge into the triples table
         (MERGE INTO on (conv_id, turn_idx, sent_idx, subj, pred, obj) —
          exactly-once effect on top of at-least-once delivery)
    → watermark on ts bounds state for any windowed aggregation

There are no watermarks/windows in the reference (no stateful ops); the
windowed turn-rate aggregation below is the health-metric stream a
production pipeline adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ie_spark.pipeline.extract import TRANSCRIPT_SCHEMA, extract_triples
from ie_spark.pipeline.graph import merge_upsert

# full fact identity (see pipeline/run.py) — narrower keys drop facts
# that share (s,p,o) but differ in polarity/modal/role
TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj",
               "polarity", "modal", "role", "prep"]


def read_transcript_stream(spark: SparkSession, src_dir: str,
                           max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of transcript parquet drops (swap for Kafka/Iceberg
    incremental reads in production; schema contract is identical)."""
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src_dir))


def start_extraction_stream(spark: SparkSession, src_dir: str,
                            triples_path: str, checkpoint_dir: str):
    """Stream: new transcript files → triples, idempotent per micro-batch.

    foreachBatch + merge_upsert = exactly-once table effect even when the
    source redelivers (the reference's hash-dedup semantics)."""
    stream = read_transcript_stream(spark, src_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_triples(batch_df)
        merge_upsert(spark, triples, triples_path, keys=TRIPLE_KEYS)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def deduped_turn_stream(stream_df: DataFrame,
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup of redelivered turns: state-store-backed
    ``dropDuplicatesWithinWatermark`` on the natural key — the streaming
    face of the reference's content-hash skip (at-least-once source →
    effectively-once rows), with the watermark bounding dedup state so a
    10^12-turn stream never accumulates unbounded keys."""
    return (stream_df.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"]))


def conversation_state_stream(spark: SparkSession, src_dir: str,
                              idle_timeout_ms: int = 0):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    tracks per-conversation running state (turn count, first/last event
    time) across micro-batches and emits one updated summary row per
    conversation per batch.  This is the Structured-Streaming shape for
    any per-conversation accumulation the batch pipeline can't express
    (e.g. incremental coreference state at 10^12-turn scale).

    State: (n_turns:int, first_ts:long, last_ts:long) per conv_id.
    ``idle_timeout_ms > 0`` enables processing-time state eviction for
    long-running continuous queries; leave 0 for availableNow/batch-drain
    runs (a pending processing-time timer forces extra empty micro-batches
    under availableNow, observed empirically)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = read_transcript_stream(spark, src_dir)

    output_schema = ("conv_id string, n_turns long, "
                     "first_ts timestamp, last_ts timestamp")
    state_schema = "n long, first_us long, last_us long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle conversation: evict state, emit nothing
            state.remove()
            return
        n, first_us, last_us = (state.get if state.exists else (0, None, None))
        saw_rows = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            saw_rows = True
            ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            n += len(pdf)
            mn, mx = int(ts_us.min()), int(ts_us.max())
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
        if not saw_rows:
            return
        state.update((n, first_us, last_us))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            "conv_id": [key[0]],
            "n_turns": [n],
            "first_ts": [pd.Timestamp(first_us * 1000)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        })

    return (stream
            .select("conv_id", "turn_idx", "ts")
            .groupBy("conv_id")
            .applyInPandasWithState(
                update,
                outputStructType=output_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                             if idle_timeout_ms > 0
                             else GroupStateTimeout.NoTimeout)))


def turn_rate_stream(spark: SparkSession, src_dir: str,
                     window: str = "1 minute",
                     watermark: str = "5 minutes"):
    """Streaming health metric: turns/conversations per event-time window
    with late-data watermarking (bounded state)."""
    stream = read_transcript_stream(spark, src_dir)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window))
            .agg(F.count("*").alias("n_turns"),
                 F.approx_count_distinct("conv_id").alias("n_convs")))
