"""Temporal joins Spark has no native operator for, expressed as
shuffle-bounded compositions (no range-explosion, no nested loop).

``asof_join`` — the point-in-time join ("for each left row, the most
recent right row at or before it") — is the canonical one: the naive
formulation is a range self-join (quadratic per key), and Spark has no
ASOF JOIN.  The scalable shape is union → one window per key:

    left ∪ right  (right's payload NULL on left rows and vice versa)
      → window PARTITION BY key ORDER BY (ts, side)
      → last(payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
      → keep left rows

One hash shuffle on the key, state = one row of carried payload per
partition position — O(|L|+|R|) at any scale.  A hot key concentrates
its rows in one partition like any keyed window; if a single key's
history exceeds a partition, pre-bucket the time axis and carry the
last value across bucket boundaries (the same fix every engine applies).

DuckDB ships a native ASOF JOIN, which makes a bit-exact independent
oracle for the whole operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str = "ts", value_cols: "list[str] | None" = None,
              prefix: str = "r_", strict: bool = True) -> DataFrame:
    """For each left row: the latest right row with the same key and
    ``r.ts < l.ts`` (``strict=True``) or ``r.ts <= l.ts`` — all left
    columns plus ``<prefix><ts_col>`` and ``<prefix><value>`` for each
    requested right value column (NULL when no right row precedes).

    The tie direction is encoded in the sort: at equal timestamps the
    right row sorts BEFORE the left row for inclusive semantics (so the
    window sees it) and AFTER for strict (so it doesn't).  Right rows
    should be unique per (key, ts) — pre-aggregate otherwise, or which
    of the tied rows wins follows the engine's window order and is not
    deterministic.

    The whole right payload travels as ONE struct through the window:
    per-column last(ignorenulls) would let a NULL value column fall
    through to an OLDER right row's value, silently mixing rows
    (review finding, reproduced against DuckDB's native ASOF JOIN).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in key_cols and c != ts_col]
    left_side, right_side = (0, 1) if strict else (1, 0)
    rcols = [prefix + ts_col] + [prefix + v for v in value_cols]
    # internal/output name collisions would silently shadow left columns
    # (advice r05): fail loudly instead
    clash = ({"_side", "_r"} | set(rcols)) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns collide with internal/output names "
            f"{sorted(clash)}; rename them or pass a different prefix")
    # a NULL-ts right row sorts NULLS FIRST and would be carried as the
    # 'latest preceding' payload for every left row (advice r05): a NULL
    # event time is never a valid as-of match — drop such rows
    right = right.filter(F.col(ts_col).isNotNull())
    r2 = (right.select(
        *key_cols, ts_col,
        F.struct(F.col(ts_col).alias(prefix + ts_col),
                 *[F.col(v).alias(prefix + v) for v in value_cols])
        .alias("_r"))
        .withColumn("_side", F.lit(right_side)))
    l2 = left.withColumn("_side", F.lit(left_side))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *left.columns, "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"))
    return (filled.filter(F.col("_side") == left_side)
            .select(*left.columns,
                    *[F.col(f"_r.{c}").alias(c) for c in rcols]))


def interval_join(left: DataFrame, right: DataFrame,
                  l_start: str, l_end: str, r_start: str, r_end: str,
                  bucket_us: int = 3_600_000_000) -> DataFrame:
    """Interval-overlap (range) join: all (left, right) row pairs whose
    CLOSED intervals [l_start, l_end] and [r_start, r_end] overlap —
    without the quadratic range-predicate join Spark would otherwise
    plan (BroadcastNestedLoopJoin on a pure inequality condition).

    Time-bucket decomposition: each interval explodes to the coarse
    buckets it touches, candidates come from an EQUI-join on the bucket
    id, the exact overlap predicate filters them, and the classic
    duplicate problem (a pair sharing several buckets) is solved
    allocation-free: a pair is kept only in the FIRST bucket both
    intervals occupy — max(floor(l_start/w), floor(r_start/w)) — so no
    distinct shuffle is needed.  Fan-out per row = interval length /
    bucket width: pick ``bucket_us`` near the typical interval length.
    Left and right column names must be disjoint.
    """
    def us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    lb0, rb0 = F.expr(f"_l_us div {bucket_us}"), F.expr(f"_r_us div {bucket_us}")
    le = (left.withColumn("_l_us", us(l_start))
          .withColumn("_l_us_end", us(l_end))
          .withColumn("_b", F.explode(F.sequence(
              lb0, F.expr(f"_l_us_end div {bucket_us}")))))
    re_ = (right.withColumn("_r_us", us(r_start))
           .withColumn("_r_us_end", us(r_end))
           .withColumn("_b", F.explode(F.sequence(
               rb0, F.expr(f"_r_us_end div {bucket_us}")))))
    cand = le.join(re_, "_b")
    first_shared = F.greatest(F.expr(f"_l_us div {bucket_us}"),
                              F.expr(f"_r_us div {bucket_us}"))
    overlap = ((F.col(l_start) <= F.col(r_end)) &
               (F.col(r_start) <= F.col(l_end)))
    return (cand.filter((F.col("_b") == first_shared) & overlap)
            .drop("_b", "_l_us", "_l_us_end", "_r_us", "_r_us_end"))
