"""ie_spark — a from-scratch, PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of marbles-ai/ie.

Pipeline: transcripts (Iceberg/parquet) → per-turn mention detection +
predicate-argument (subj, pred, obj) triple extraction (vectorized Arrow
pandas UDFs) → blocked-similarity entity linking (broadcast dictionary) →
canonicalization via connected components → node/edge graph tables with
idempotent merge, per-partition checkpoints and lineage.

Reference semantics: marbles-ai/ie (read-only at /root/reference). This is
NOT a port — the reference's DRS/CCG composition engine is re-expressed as
a deterministic shallow analyzer running inside Arrow-batched pandas UDFs,
with all relational work (dedup, linking, components, materialization) done
with native Spark DataFrame operators so Catalyst/AQE handle planning.
"""

__version__ = "0.1.0"
