"""Shared partitioning helpers.

One home for the scale-adaptive scan fan-out so its threshold/policy
cannot drift between call sites (r06 review finding: four hand-rolled
copies).  Guarded by ``tests/test_plans.py::test_fan_out_noops_on_wide_input``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def adaptive_fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition (round-robin when no ``keys``) onto the session's
    full parallelism — but ONLY when the input arrives with fewer
    partitions than half of it (guide §2.5 'input skew: one huge
    unsplittable file': a single-row-group parquet file is one scan
    partition, serializing every downstream operator on one core even
    under all-broadcast plans).  At cluster scale the input partitioning
    already exceeds the target and this returns ``df`` unchanged — no
    exchange appears in the plan.  Keys must be deterministic,
    high-cardinality columns (never rand(); guide §2.5 retry semantics);
    prefer the downstream join/window key so the exchange is reused.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, *keys)
    return df
