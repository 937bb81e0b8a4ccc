"""End-to-end orchestrator: one call produces the full KG, idempotently."""

import os

from ie_spark.data.synthetic import corpus_to_pandas
from ie_spark.pipeline.extract import transcripts_from_pandas
from ie_spark.pipeline.run import run_pipeline


def test_run_pipeline_end_to_end_and_idempotent(spark, tmp_path):
    tr, gt, _ = corpus_to_pandas(n_convs=15, seed=33)
    df = transcripts_from_pandas(spark, tr)
    out = str(tmp_path / "kg")

    s1 = run_pipeline(spark, df, out)
    assert s1["n_turns"] == len(tr)
    assert s1["n_triples"] > 0
    assert s1["n_nodes"] > 0 and s1["n_edges"] > 0

    # golden subset: every fixture triple is in the materialized table
    triples = spark.read.parquet(os.path.join(out, "triples"))
    got = {tuple(r) for r in
           triples.select("conv_id", "turn_idx", "subj", "pred", "obj").collect()}
    want = {tuple(r) for r in
            gt[["conv_id", "turn_idx", "subj", "pred", "obj"]]
            .itertuples(index=False)}
    assert want <= got

    # idempotency: second run leaves every table identical
    before = {t: spark.read.parquet(os.path.join(out, t)).count()
              for t in ("mentions", "triples", "linked", "edges", "nodes")}
    s2 = run_pipeline(spark, df, out)
    after = {t: spark.read.parquet(os.path.join(out, t)).count()
             for t in ("mentions", "triples", "linked", "edges", "nodes")}
    assert before == after
    assert s2["n_triples"] == s1["n_triples"]


def test_run_pipeline_salts_mega_conversations(spark, tmp_path):
    """North rule: mega-conversations found by the count pre-pass are
    salted across partitions inside run_pipeline."""
    tr, gt, _ = corpus_to_pandas(n_convs=20, seed=13, mega_frac=0.3,
                                 mega_mult=30)
    df = transcripts_from_pandas(spark, tr)
    out = str(tmp_path / "kg_salted")
    s = run_pipeline(spark, df, out, salt_threshold=100)
    assert s["n_turns"] == len(tr)
    # same P/R contract holds under salted repartition
    triples = spark.read.parquet(os.path.join(out, "triples"))
    got = {tuple(r) for r in
           triples.select("conv_id", "turn_idx", "subj", "pred", "obj").collect()}
    want = {tuple(r) for r in
            gt[["conv_id", "turn_idx", "subj", "pred", "obj"]]
            .itertuples(index=False)}
    assert want <= got
