"""spark-submit entry point for the full KG construction pipeline.

    spark-submit --py-files ie_spark.zip scripts/run_kg_pipeline.py \
        --input /warehouse/transcripts --out /warehouse/kg

Reads a transcript table (parquet dir; Iceberg identifier works the same
through spark.read.table when a catalog is configured), runs
extract → link → coref → canonicalize → materialize idempotently, and
prints one JSON stats line.  ``--synthetic N`` generates the deterministic
corpus instead (for smoke runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcript parquet dir (or omit and "
                                    "use --synthetic)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic conversations instead")
    ap.add_argument("--out", required=True, help="output KG directory")
    ap.add_argument("--salt-threshold", type=int, default=100_000,
                    help="turns per conversation above which per-turn "
                         "salting kicks in (None-like <=0 disables)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ie_spark.session import get_spark
    spark = get_spark("kg-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from ie_spark.data.synthetic import transcripts_spark
        transcripts = transcripts_spark(spark, args.synthetic, seed=42)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synthetic")

    from ie_spark.pipeline.run import run_pipeline
    stats = run_pipeline(
        spark, transcripts, args.out,
        salt_threshold=args.salt_threshold if args.salt_threshold > 0
        else None)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
