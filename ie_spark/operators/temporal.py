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

from pyspark.sql import DataFrame, Window
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
    """
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in key_cols and c != ts_col]
    left_side, right_side = (0, 1) if strict else (1, 0)
    rcols = [prefix + ts_col] + [prefix + v for v in value_cols]
    r2 = (right.select(*key_cols, ts_col,
                       F.col(ts_col).alias(prefix + ts_col),
                       *[F.col(v).alias(prefix + v) for v in value_cols])
          .withColumn("_side", F.lit(right_side)))
    l2 = left.withColumn("_side", F.lit(left_side))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *left.columns, "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols])
    return filled.filter(F.col("_side") == left_side).drop("_side")
