"""Structured Streaming ingestion: file-drop source → extraction →
idempotent merge (exactly-once table effect over at-least-once delivery,
the reference's SQS+hash-dedup semantics)."""

import os

from ie_spark.data.synthetic import corpus_to_pandas
from ie_spark.pipeline.extract import transcripts_from_pandas
from ie_spark.streaming.stream import start_extraction_stream


def test_stream_extracts_and_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    triples = str(tmp_path / "triples")
    cp = str(tmp_path / "cp")
    os.makedirs(src)

    tr, gt, _ = corpus_to_pandas(n_convs=10, seed=21)
    df = transcripts_from_pandas(spark, tr)
    df.write.mode("overwrite").parquet(src)

    q = start_extraction_stream(spark, src, triples, cp)
    q.awaitTermination(120)
    out1 = spark.read.parquet(triples)
    n1 = out1.count()
    assert n1 > 0

    # redeliver the same files under a fresh checkpoint (at-least-once
    # upstream): merge keeps the table unchanged
    q2 = start_extraction_stream(spark, src, triples, str(tmp_path / "cp2"))
    q2.awaitTermination(120)
    assert spark.read.parquet(triples).count() == n1

    # golden subset check: extracted triples match fixtures for these convs
    key = {"conv_id", "turn_idx", "subj", "pred", "obj"}
    got = {tuple(r) for r in
           out1.select("conv_id", "turn_idx", "subj", "pred", "obj").collect()}
    want = {tuple(r) for r in
            gt[["conv_id", "turn_idx", "subj", "pred", "obj"]]
            .itertuples(index=False)}
    assert want <= got
