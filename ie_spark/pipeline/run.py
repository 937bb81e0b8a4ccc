"""End-to-end pipeline orchestrator: transcripts → triples + mentions →
linked mentions → canonical nodes/edges, all materialized with idempotent
merge and per-bucket checkpoints.

This is the single entry point a user of the reference would switch to:

    from ie_spark.pipeline.run import run_pipeline
    stats = run_pipeline(spark, transcripts_df, "/warehouse/kg")

Produces (parquet dirs or Iceberg tables, see graph.merge_upsert):
    <out>/mentions   <out>/triples   <out>/linked   <out>/nodes
    <out>/edges      <out>/_checkpoints
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ie_spark.pipeline.canonicalize import (
    build_identity_edges,
    canonical_mention_map,
    canonical_nodes,
    connected_components,
)
from ie_spark.pipeline.extract import (
    extract_all,
    find_hot_convs,
    repartition_by_conv,
    split_combined,
)
from ie_spark.pipeline.graph import merge_upsert, write_checkpoint
from ie_spark.pipeline.linking import (build_candidate_dict, kb_metadata,
                                       link_mentions)

# the FULL fact identity: same (s,p,o) in one sentence can differ in
# polarity/modal/role ("deployed the service and did not deploy the
# service") — narrower keys would make MERGE drop real facts
TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj",
               "polarity", "modal", "role", "prep"]
MENTION_KEYS = ["mention_id"]


def run_pipeline(spark: SparkSession, transcripts: DataFrame, out_dir: str,
                 candidates: DataFrame | None = None,
                 job_id: str = "pipeline",
                 salt_threshold: int | None = 100_000,
                 num_partitions: int | None = None,
                 spell_normalize: bool = False) -> dict:
    """Full KG construction run.  Idempotent: re-running on the same input
    yields identical tables (merge on natural keys).

    Partitioning (north rule): the input is explicitly hash-repartitioned
    by conv_id; conversations exceeding ``salt_threshold`` turns (found by
    a cheap count pre-pass) are salted per-turn so a 10^8-turn
    mega-conversation cannot pin one partition.  Pass
    ``salt_threshold=None`` to skip the pre-pass when the input is known
    to be well-distributed (extraction itself is per-turn and would run
    shuffle-free without it)."""
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)

    if spell_normalize:
        # opt-in C14 pre-pass (reference kb/spell.py, never in its main
        # path either): broadcast SymSpell delete-index, one Arrow UDF.
        # OFF for every oracled/golden path.
        from ie_spark.textproc.spell import with_spell_normalized
        transcripts = with_spell_normalized(transcripts)

    if salt_threshold is not None:
        parts = num_partitions or spark.sparkContext.defaultParallelism * 2
        hot = find_hot_convs(transcripts, salt_threshold)
        transcripts = repartition_by_conv(
            transcripts, parts, salt_buckets=parts if hot else 0,
            hot_convs=hot or None)

    # 1. single-pass extraction (one scan, one Arrow UDF pass, no shuffle
    #    beyond the explicit repartition above), materialized once then
    #    split from storage
    staged = os.path.join(out_dir, "_extracted")
    extract_all(transcripts).write.mode("overwrite").parquet(staged)
    combined = spark.read.parquet(staged)
    mentions, triples = split_combined(combined)

    merge_upsert(spark, mentions, os.path.join(out_dir, "mentions"),
                 keys=MENTION_KEYS)
    merge_upsert(spark, triples, os.path.join(out_dir, "triples"),
                 keys=TRIPLE_KEYS)
    mentions = spark.read.parquet(os.path.join(out_dir, "mentions"))
    triples = spark.read.parquet(os.path.join(out_dir, "triples"))

    # 2. entity linking (broadcast blocked similarity join)
    candidates = candidates or build_candidate_dict(spark)
    linked = link_mentions(mentions, candidates)
    merge_upsert(spark, linked, os.path.join(out_dir, "linked"),
                 keys=MENTION_KEYS)
    linked = spark.read.parquet(os.path.join(out_dir, "linked"))

    # 2b. cross-sentence pronoun resolution (nearest-antecedent)
    from ie_spark.pipeline.coref import resolve_pronouns
    coref = resolve_pronouns(mentions)
    merge_upsert(spark, coref, os.path.join(out_dir, "coref"),
                 keys=["conv_id", "turn_idx", "sent_idx", "pronoun"])

    # 3. canonicalization (connected components over mention–entity + _AKA)
    labels = connected_components(build_identity_edges(linked, triples))
    nodes = canonical_nodes(labels, linked, kb=kb_metadata(spark))
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))

    # 4. edge materialization with canonical endpoints; the stem→node map
    # is KB-canonicalization-scoped (distinct linked entity stems), so
    # broadcast explicitly rather than relying on AQE (verdict #8)
    mmap = F.broadcast(canonical_mention_map(labels))
    ev = triples.filter(~F.col("pred").isin("_AKA", "_POSS"))
    edges = (ev
             .join(mmap.withColumnRenamed("stem", "subj")
                   .withColumnRenamed("node_id", "src"), "subj", "left")
             .join(mmap.withColumnRenamed("stem", "obj")
                   .withColumnRenamed("node_id", "dst"), "obj", "left")
             .select(F.coalesce("src", F.concat(F.lit("M:"), "subj")).alias("src"),
                     "pred",
                     F.coalesce("dst", F.concat(F.lit("M:"), "obj")).alias("dst"),
                     "conv_id", "turn_idx", "sent_idx", "polarity"))
    merge_upsert(spark, edges, os.path.join(out_dir, "edges"),
                 keys=["src", "pred", "dst", "conv_id", "turn_idx",
                       "sent_idx", "polarity"])

    stats = {
        "job_id": job_id,
        "n_turns": transcripts.count(),
        "n_mentions": mentions.count(),
        "n_triples": triples.count(),
        "n_nodes": spark.read.parquet(os.path.join(out_dir, "nodes")).count(),
        "n_edges": spark.read.parquet(os.path.join(out_dir, "edges")).count(),
        "wall_s": round(time.time() - t0, 2),
    }
    write_checkpoint(spark, os.path.join(out_dir, "_checkpoints"), job_id,
                     bucket=-1, n_turns=stats["n_turns"],
                     n_triples=stats["n_triples"],
                     wall_ms=int(stats["wall_s"] * 1000),
                     lineage=f"run_pipeline:v1:{out_dir}")
    return stats
