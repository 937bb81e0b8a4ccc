"""Graph materialization: nodes/edges tables with idempotent merge, plus
per-partition checkpoint/lineage bookkeeping.

The reference's sink is S3 JSON + SQS at-least-once with content-hash dedup
(``marbles/aws/__init__.py:115-254``); the Spark-native equivalent is
MERGE-based idempotent appends (north rule).  On a cluster with an Iceberg
catalog, ``merge_upsert`` issues a real ``MERGE INTO``; in this sandbox
(no Iceberg runtime jar) it falls back to an anti-join + append with the
same semantics — run twice, get identical tables (tests assert this).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.sql("SELECT 1").collect()
        return "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions" in (
            spark.conf.get("spark.sql.extensions", "") or "")
    except Exception:
        return False


def merge_upsert(spark: SparkSession, df: DataFrame, target: str,
                 keys: list[str]) -> None:
    """Idempotent upsert of ``df`` into ``target`` on ``keys``.

    target: an Iceberg table name (catalog present) or a parquet directory
    path.  Parquet fallback = read-existing → anti-join new rows → append,
    which matches MERGE INTO ... WHEN NOT MATCHED THEN INSERT semantics for
    immutable fact rows (triples/edges are append-only facts).
    """
    if _iceberg_available(spark) and not target.startswith(("/", "file:")):
        df.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {target} t USING _merge_src s ON {on} "
            f"WHEN NOT MATCHED THEN INSERT *")
        return
    # parquet fallback with identical observable semantics
    if os.path.isdir(target) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(target)):
        existing = spark.read.parquet(target).select(*keys).distinct()
        new_rows = df.join(F.broadcast(existing) if len(keys) <= 4 else existing,
                           on=keys, how="left_anti")
        new_rows.write.mode("append").parquet(target)
    else:
        df.write.mode("overwrite").parquet(target)


CHECKPOINT_SCHEMA = (
    "job_id string, bucket int, status string, n_turns long, "
    "n_triples long, wall_ms long, lineage string, finished_at timestamp"
)


def completed_buckets(spark: SparkSession, checkpoint_path: str) -> list[int]:
    """Buckets already marked ok in the checkpoint table (resume support)."""
    if not (os.path.isdir(checkpoint_path) and os.listdir(checkpoint_path)):
        return []
    cp = spark.read.parquet(checkpoint_path)
    return [r[0] for r in
            cp.filter(F.col("status") == "ok").select("bucket").distinct().collect()]


def write_checkpoint(spark: SparkSession, checkpoint_path: str, job_id: str,
                     bucket: int, n_turns: int, n_triples: int,
                     wall_ms: int, lineage: str) -> None:
    row = [(job_id, bucket, "ok", n_turns, n_triples, wall_ms, lineage)]
    df = (spark.createDataFrame(
            row, "job_id string, bucket int, status string, n_turns long, "
                 "n_triples long, wall_ms long, lineage string")
          .withColumn("finished_at", F.current_timestamp()))
    df.write.mode("append").parquet(checkpoint_path)


def run_extraction_job(spark: SparkSession, transcripts: DataFrame,
                       out_dir: str, n_buckets: int = 8,
                       job_id: str | None = None) -> dict:
    """Resumable bucketed extraction: conv_id-hash buckets are processed
    independently; each completed bucket writes triples + a checkpoint row
    with lineage and metrics.  A re-run anti-joins completed buckets and
    only processes the remainder (north rule: 'resumable from per-partition
    checkpoints carrying lineage + metrics').

    At 10^12-turn scale n_buckets is thousands and each bucket is a separate
    job stage; bucket granularity bounds re-work on failure.
    """
    from ie_spark.pipeline.extract import extract_triples

    job_id = job_id or uuid.uuid4().hex[:12]
    triples_path = os.path.join(out_dir, "triples")
    cp_path = os.path.join(out_dir, "_checkpoints")
    lineage = f"extract:v1:{transcripts.schema.simpleString()[:80]}"

    done = set(completed_buckets(spark, cp_path))
    bucketed = transcripts.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))
    stats = {"job_id": job_id, "buckets_done": sorted(done), "processed": []}
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        n_turns = part.count()
        triples = extract_triples(part)
        merge_upsert(spark, triples, triples_path,
                     keys=["conv_id", "turn_idx", "sent_idx",
                           "subj", "pred", "obj"])
        n_triples = (spark.read.parquet(triples_path)
                     .join(part.select("conv_id").distinct(), "conv_id")
                     .count())
        write_checkpoint(spark, cp_path, job_id, b, n_turns, n_triples,
                         int((time.time() - t0) * 1000), lineage)
        stats["processed"].append(b)
    return stats
