"""Diagnostic bench (guide §1): per-query build/first/warm breakdown.

NOT the driver contract (bench.py is frozen).  For each headline query:
  - build_s : DataFrame construction (driver-side plan assembly)
  - run1_s  : first noop-sink execution (Catalyst analyze+optimize+codegen
              + execution)
  - run2_s  : second noop execution (mostly execution; plans cached)
Optionally writes .explain('formatted') to plans/r06/<name>_<tag>.txt.

Usage:
    python bench_extra.py [--plans TAG] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ie_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "events_sessionize",
    "doc_exact_dedup",
    "doc_minhash_dedup",
    "doc_ngram_dups",
    "doc_quality",
    "emb_cosine_topk",
    "emb_near_dups_blocked",
    "media_features",
]


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry
    from ie_spark.operators.dedup import embedding_near_dups

    args = sys.argv[1:]
    plans_tag = None
    if args and args[0] == "--plans":
        if len(args) < 2:
            sys.exit("usage: bench_extra.py [--plans TAG] [query ...]")
        plans_tag = args[1]
        args = args[2:]
    wanted = args or HEADLINE
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR",
                               os.path.join("plans", "r06"))

    spark = get_spark("ie-spark-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry.queries()

    out = {}
    for name in wanted:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        if name == "emb_near_dups_blocked":
            emb = spark.read.parquet(os.path.join(SF_DIR,
                                                  "embeddings.parquet"))
            df = embedding_near_dups(emb, threshold=0.8, block_bits=8)
        else:
            df = qmap[name](spark, SF_DIR)
        t1 = time.time()
        if plans_tag:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir,
                                   f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        t2 = time.time()
        _sink(df)
        t3 = time.time()
        _sink(df)
        t4 = time.time()
        out[name] = {"build_s": round(t1 - t0, 3),
                     "run1_s": round(t3 - t2, 3),
                     "run2_s": round(t4 - t3, 3)}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
