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

TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj"]


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
