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

from pyspark.errors import AnalysisException
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
    # parquet fallback with identical observable semantics.  MERGE keys a
    # batch by `keys`, so dedup within the batch too (duplicate-key rows in
    # one batch would all insert otherwise).  No manual broadcast hint: the
    # existing-keys side grows with the TARGET table (billions of rows at
    # 10^12 turns) — let AQE/autoBroadcastJoinThreshold size-gate the join
    # strategy instead of force-broadcasting an unbounded set.
    if os.path.isdir(target) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(target)):
        existing = spark.read.parquet(target).select(*keys).distinct()
        new_rows = df.dropDuplicates(keys).join(existing, on=keys,
                                                how="left_anti")
        new_rows.write.mode("append").parquet(target)
    else:
        df.dropDuplicates(keys).write.mode("overwrite").parquet(target)


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


def write_checkpoints(spark: SparkSession, checkpoint_path: str,
                      rows: list[tuple]) -> None:
    """Batched checkpoint append: one write for any number of bucket rows
    (per-bucket appends would be n_buckets tiny sequential jobs)."""
    df = (spark.createDataFrame(
            rows, "job_id string, bucket int, status string, n_turns long, "
                  "n_triples long, wall_ms long, lineage string")
          .withColumn("finished_at", F.current_timestamp()))
    df.coalesce(1).write.mode("append").parquet(checkpoint_path)


def write_checkpoint(spark: SparkSession, checkpoint_path: str, job_id: str,
                     bucket: int, n_turns: int, n_triples: int,
                     wall_ms: int, lineage: str) -> None:
    write_checkpoints(spark, checkpoint_path,
                      [(job_id, bucket, "ok", n_turns, n_triples,
                        wall_ms, lineage)])


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def run_extraction_job(spark: SparkSession, transcripts: DataFrame,
                       out_dir: str, n_buckets: int = 8,
                       job_id: str | None = None) -> dict:
    """Resumable bucketed extraction, SINGLE PASS over the input:

      1. remaining buckets = all − checkpointed (one filter, not a loop)
      2. one extraction job writes ``partitionBy(_bucket)`` with DYNAMIC
         partition overwrite — only the re-processed buckets' directories
         are replaced, so a torn write from a crashed attempt is healed on
         resume and completed buckets are never touched
      3. per-bucket metrics come from two partition-pruned aggregations
         (input turn counts + read-back of just-written bucket partitions —
         ``_bucket`` is a real partition column, so the read-back scans only
         the new buckets), and the checkpoint rows append in ONE batch

    The previous formulation looped buckets on the driver: O(n_buckets)
    full input scans + a count + a full-table join per bucket — thousands
    of sequential jobs at 10^12-turn scale.  This shape is O(1) jobs
    regardless of n_buckets; bucket granularity still bounds re-work on
    failure (north rule: 'resumable from per-partition checkpoints carrying
    lineage + metrics').
    """
    from ie_spark.pipeline.extract import extract_triples

    job_id = job_id or uuid.uuid4().hex[:12]
    triples_path = os.path.join(out_dir, "triples")
    cp_path = os.path.join(out_dir, "_checkpoints")
    lineage = f"extract:v1:{transcripts.schema.simpleString()[:80]}"

    done = set(completed_buckets(spark, cp_path))
    todo = [b for b in range(n_buckets) if b not in done]
    stats = {"job_id": job_id, "buckets_done": sorted(done),
             "processed": sorted(todo)}
    if not todo:
        stats["processed"] = []
        return stats

    t0 = time.time()
    bucketed = transcripts.withColumn("_bucket", _bucket_col(n_buckets))
    part = bucketed if not done else bucketed.filter(
        F.col("_bucket").isin(todo))

    # per-bucket input sizes ride the EXTRACTION pass itself via the
    # observation API (one count_if per bucket, collected by the write
    # job) — the previous groupBy().collect() was a second full input
    # scan, pure waste at 10^12 turns.  Bucket count is job config, so
    # the aggregate width is bounded and known up front.
    from pyspark.sql import Observation
    obs = Observation(f"extract-{job_id}")
    part = part.observe(
        obs, *[F.count_if(F.col("_bucket") == b).alias(f"b{b}")
               for b in todo])

    # extraction drops helper columns; _bucket is a pure function of
    # conv_id, so recompute it on the output (no shuffle either way)
    triples = extract_triples(part).withColumn("_bucket",
                                               _bucket_col(n_buckets))
    # dynamic partition overwrite only replaces partitions PRESENT in the
    # new write: a todo bucket whose re-extraction yields zero triples
    # would keep a torn attempt's stale files (and the read-back would
    # check them in as 'ok').  Drop the todo buckets' directories first so
    # resume semantics hold even for now-empty buckets.
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(triples_path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        for b in todo:
            bdir = jvm.org.apache.hadoop.fs.Path(
                f"{triples_path}/_bucket={b}")
            if fs.exists(bdir):
                fs.delete(bdir, True)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (triples.write.mode("overwrite").partitionBy("_bucket")
         .parquet(triples_path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # read back ONLY the new buckets (partition pruning on _bucket); a
    # fully-empty input writes no partition files at all, so guard the
    # first-run schema inference
    try:
        n_triples = {r["_bucket"]: r["n"] for r in
                     (spark.read.parquet(triples_path)
                      .filter(F.col("_bucket").isin(todo))
                      .groupBy("_bucket").agg(F.count("*").alias("n"))
                      .collect())}
    except AnalysisException:
        n_triples = {}
    # observation metrics materialized by the write job above
    row = obs.get
    n_turns = {b: int(row[f"b{b}"]) for b in todo}
    # wall_ms is the enclosing single-pass job's wall clock, shared by
    # every bucket row it completed (one pass cannot time buckets
    # individually — per-bucket latency lives in the Spark task metrics)
    wall_ms = int((time.time() - t0) * 1000)
    write_checkpoints(
        spark, cp_path,
        [(job_id, b, "ok", int(n_turns.get(b, 0)),
          int(n_triples.get(b, 0)), wall_ms, lineage) for b in todo])
    return stats


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int = 64,
                   sort_cols: "list[str] | None" = None,
                   mode: str = "overwrite") -> None:
    """Materialize a table bucketed (and optionally sorted) by its join
    key — the co-located-join primitive: two tables bucketed the same
    way join WITHOUT either side shuffling (no Exchange in the plan,
    asserted in tests), and per-key aggregations skip their exchange
    too.  At 10^12-edge scale, bucketing the edge table by src once at
    write time amortizes every downstream per-key join/agg against it.

    ``n_buckets`` should be sized so a bucket fits an executor's
    memory at the target scale and kept IDENTICAL across the tables
    meant to co-join (Spark only elides the shuffle when bucket counts
    match).  Requires a table catalog (saveAsTable) — path-only
    parquet writes cannot carry bucket metadata.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
