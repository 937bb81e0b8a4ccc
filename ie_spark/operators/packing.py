"""Sequence packing: lay documents out into fixed-capacity training
windows (the concat-then-chunk layout GPT-style pre-training uses).

The plan is a PLAN, not a materialization: each document gets its byte
position in a virtual token stream — which training sequence(s) it lands
in and at what offset — so a downstream writer can emit shards without
ever holding more than one partition of text.  Packing is per-SHARD: a
global concatenation order would serialize the corpus through one
ordered stream (a full range shuffle + a single writer at 100 TB), so
documents are first routed to ``n_shards`` independent streams by a
stable md5-based shard key, and each shard packs independently under a
window that shuffles once on the shard key.  At cluster scale n_shards
is set ≫ executor count (e.g. 4096) so shards parallelize and the
per-shard window state stays small; the layout stays deterministic
under reruns, repartitioning, and engine choice (md5 + integer
arithmetic only — no rand(), no floats).

The reference has no training-data ops; this follows standard public
practice (sequence packing as described in public LM-training writeups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ie_spark.operators.textstats import token_count


def shard_key(id_col: str = "doc_id", n_shards: int = 8,
              salt: str = "pack"):
    """Stable shard in [0, n_shards): first 4 hex chars of
    md5('<salt>:' + id) as an integer, mod n_shards.  Built on
    sampling._hash_prefix — ONE home for the cross-engine hash
    contract (review finding: a drifting copy would silently break
    bit-reproducibility)."""
    from ie_spark.operators.sampling import _hash_prefix
    return (F.conv(_hash_prefix(id_col, salt, n=4), 16, 10)
            .cast("long") % n_shards).cast("int")


def pack_plan(docs: DataFrame, capacity: int = 2048, n_shards: int = 8,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shard, n_tokens, start_off, first_seq, last_seq):
    where each document lands in its shard's virtual token stream.

    ``start_off`` is the document's token offset within the shard
    stream (documents concatenate in ``id_col`` order); sequence ``s``
    covers offsets [s·capacity, (s+1)·capacity), so the document spans
    training sequences ``first_seq``..``last_seq`` (a document longer
    than ``capacity`` spans several; short documents share one —
    that's the point of packing).  Zero-token documents are dropped
    (they occupy no stream positions).

    All integer arithmetic over one running-sum window per shard —
    bit-reproducible in the DuckDB oracle and stable at any
    parallelism.
    """
    w = (Window.partitionBy("shard").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .select(F.col(id_col),
                    token_count(text_col).alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
            .withColumn("shard", shard_key(id_col, n_shards))
            .withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
            .withColumn("start_off",
                        (F.col("cum") - F.col("n_tokens")).cast("long"))
            .withColumn("first_seq", F.expr(f"start_off div {capacity}"))
            .withColumn("last_seq", F.expr(f"(cum - 1) div {capacity}"))
            .select(id_col, "shard", "n_tokens", "start_off",
                    "first_seq", "last_seq"))


def pack_emit(docs: DataFrame, capacity: int = 2048, n_shards: int = 8,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The writer-side explosion of ``pack_plan``: one row per
    (document, training sequence) segment, telling a shard writer which
    token span of which document fills which slice of which sequence.

    Columns: doc_id, shard, seq_id, seq_off (where the segment starts
    inside the sequence), tok_from (where it starts inside the
    document), n_seg_tokens.  Per sequence the segments tile [0,
    capacity) exactly (except the shard's final partial sequence); per
    document they tile [0, n_tokens) — both asserted in tests and
    recomputable in SQL (explode = unnest(generate_series)).

    A document spans ``last_seq - first_seq + 1`` rows; the explode
    multiplies rows only for boundary-crossing documents, so output is
    |docs| + (number of crossings) ≈ |docs| + total_tokens/capacity.
    """
    plan = pack_plan(docs, capacity=capacity, n_shards=n_shards,
                     id_col=id_col, text_col=text_col)
    seq = F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id")
    seg = plan.select(id_col, "shard", "n_tokens", "start_off", seq)
    seg_start = F.greatest(F.col("start_off"),
                           F.col("seq_id") * capacity)
    seg_end = F.least(F.col("start_off") + F.col("n_tokens"),
                      (F.col("seq_id") + 1) * capacity)
    return seg.select(
        id_col, "shard", "seq_id",
        (seg_start - F.col("seq_id") * capacity).alias("seq_off"),
        (seg_start - F.col("start_off")).alias("tok_from"),
        (seg_end - seg_start).alias("n_seg_tokens"))
