"""spark-submit entry point: graph analytics over a materialized KG.

  spark-submit --py-files ie_spark.zip scripts/graph_job.py \
      --edges /warehouse/kg/edges --out /warehouse/kg/analytics \
      --passes degree,triangles,pagerank

Reads the edge table run_kg_pipeline materialized (a parquet dir, or a
catalog table identifier with ``--table``), runs the selected
passes (default: ALL of degree, two_hop, triangles, pagerank,
components, link_pred, bfs — pass --passes to run fewer; link_pred's
wedge enumeration is the most expensive on hub-heavy graphs),
writes one parquet dir per pass, and prints ONE JSON stats line with rows
and wall seconds per pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="edge table parquet dir (or identifier, see --table)")
    ap.add_argument("--table", action="store_true",
                    help="treat --edges as a catalog table identifier "
                         "(spark.read.table) instead of a parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--passes", default="",
                    help="comma list (default: all known passes)")
    ap.add_argument("--max-fanout", type=int, default=1000,
                    help="two_hop hub cap on intermediate fan-out")
    ap.add_argument("--iterations", type=int, default=5,
                    help="pagerank iteration count")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ie_spark.session import get_spark
    spark = get_spark("kg-graph-analytics", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    from ie_spark.pipeline.analytics import run_graph_analytics
    edges = (spark.read.table(args.edges) if args.table
             else spark.read.parquet(args.edges))
    stats = run_graph_analytics(
        spark, edges, args.out,
        passes=[p.strip() for p in args.passes.split(",") if p.strip()]
        or None,
        max_fanout=args.max_fanout, iterations=args.iterations)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
