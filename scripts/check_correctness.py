"""Local replica of the driver's correctness gate.

Runs each __spark_entry__ query AND its DuckDB oracle at a given sf dir,
canonicalizes both sides the way the driver does (columns sorted by name,
rows sorted by all columns, values rendered to strings), and reports
rows/schema/hash matches.  Usage:

    python scripts/check_correctness.py [query ...]      # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_correctness.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: "NULL" if v is None or
                            (isinstance(v, float) and pd.isna(v)) else str(v))
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _vhash(pdf: pd.DataFrame) -> str:
    return hashlib.sha256(
        pdf.to_csv(index=False).encode("utf-8")).hexdigest()[:16]


def main() -> None:
    import __spark_entry__ as entry
    from ie_spark.session import get_spark

    spark = get_spark("ie-spark-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qmap, omap = entry.queries(), entry.oracle_sql()
    wanted = sys.argv[1:] or list(qmap)
    n_green = n_rows_only = n_red = 0
    for name in wanted:
        try:
            sdf = qmap[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name:28s} ERROR(spark) {type(e).__name__}: {e}")
            n_red += 1
            continue
        if name not in omap:
            # rows-only check — mimic the driver's sort so unhashable cells
            # would crash here too
            try:
                _canon(sdf)
                print(f"{name:28s} rows-only rows={len(sdf)}")
                n_rows_only += 1
            except Exception as e:
                print(f"{name:28s} ERROR(canon) {type(e).__name__}: {e}")
                n_red += 1
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception as e:
            print(f"{name:28s} ERROR(oracle) {type(e).__name__}: {e}")
            n_red += 1
            continue
        s, o = _canon(sdf), _canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hmatch = rows and schema and _vhash(s) == _vhash(o)
        ok = rows and schema and hmatch
        n_green += ok
        n_red += (not ok)
        print(f"{name:28s} rows={len(s)}/{len(o)} rows_match={rows} "
              f"schema={schema} hash={hmatch}" + ("" if ok else "   <-- RED"))
        if not ok and rows and schema:
            diff = s.compare(o) if s.shape == o.shape else None
            if diff is not None and len(diff):
                print(diff.head(5).to_string())
    print(f"\ngreen={n_green} rows_only={n_rows_only} red={n_red}")


if __name__ == "__main__":
    main()
