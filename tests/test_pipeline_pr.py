"""End-to-end P/R gate (north rule: triples P/R ≥ 0.95 vs fixtures) plus
stable-ordering and mention checks, all through Spark."""

import pandas as pd
import pytest

from ie_spark.data.synthetic import corpus_to_pandas
from ie_spark.pipeline.extract import (
    extract_all,
    extract_mentions,
    extract_triples,
    ordered_turns,
    split_combined,
    transcripts_from_pandas,
)

KEY = ["conv_id", "turn_idx", "subj", "pred", "obj", "polarity"]


@pytest.fixture(scope="module")
def corpus():
    return corpus_to_pandas(n_convs=60, seed=42, mega_frac=0.02)


@pytest.fixture(scope="module")
def transcripts(spark, corpus):
    return transcripts_from_pandas(spark, corpus[0])


def _pr(pred_set, gold_set):
    tp = len(pred_set & gold_set)
    return tp / max(len(pred_set), 1), tp / max(len(gold_set), 1)


def test_triples_precision_recall(spark, corpus, transcripts):
    _, golden, _ = corpus
    out = extract_triples(transcripts).toPandas()
    p, r = _pr(set(map(tuple, out[KEY].itertuples(index=False))),
               set(map(tuple, golden[KEY].itertuples(index=False))))
    assert p >= 0.95, f"precision {p:.4f} < 0.95"
    assert r >= 0.95, f"recall {r:.4f} < 0.95"


def test_mentions_precision_recall(spark, corpus, transcripts):
    _, _, golden_m = corpus
    out = extract_mentions(transcripts).toPandas()
    out = out[out.kind.isin(["entity", "propername", "pronoun"])]
    mkey = ["conv_id", "turn_idx", "stem", "kind"]
    p, r = _pr(set(map(tuple, out[mkey].itertuples(index=False))),
               set(map(tuple, golden_m[mkey].itertuples(index=False))))
    assert p >= 0.95 and r >= 0.95, f"mentions P={p:.3f} R={r:.3f}"


def test_single_pass_combined_equals_two_pass(spark, transcripts):
    m2, t2 = split_combined(extract_all(transcripts))
    t1 = extract_triples(transcripts)
    assert t1.exceptAll(t2).count() == 0
    assert t2.exceptAll(t1).count() == 0
    m1 = extract_mentions(transcripts)
    assert m1.exceptAll(m2).count() == 0


def test_extraction_deterministic_across_partitioning(spark, transcripts):
    a = extract_triples(transcripts.repartition(13)).toPandas()
    b = extract_triples(transcripts.coalesce(1)).toPandas()
    sa = set(map(tuple, a[KEY].itertuples(index=False)))
    sb = set(map(tuple, b[KEY].itertuples(index=False)))
    assert sa == sb and len(a) == len(b)


def test_stable_turn_ordering(spark, corpus, transcripts):
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    pdf = (ordered_turns(transcripts)
           .select("conv_id", "turn_idx", "turn_rank", "text")
           .toPandas())
    # dense ranks: turn_rank == turn_idx + 1 for every row
    assert (pdf["turn_rank"] == pdf["turn_idx"] + 1).all()
    src = corpus[0]
    merged = pdf.merge(src[["conv_id", "turn_idx", "text"]],
                       on=["conv_id", "turn_idx"], suffixes=("_s", "_p"))
    assert len(merged) == len(src)
    assert (merged["text_s"] == merged["text_p"]).all()


def test_constituents_match_template_goldens(spark, corpus, transcripts):
    """Template-defined golden phrase inventory == extracted constituents
    (exact bag, surface projection) through Spark."""
    from ie_spark.data.synthetic import corpus_constituents_golden
    from ie_spark.pipeline.extract import extract_constituents_df
    gold = corpus_constituents_golden(n_convs=60, seed=42, mega_frac=0.02)
    got = (extract_constituents_df(transcripts)
           .select("conv_id", "turn_idx", "sent_idx", "vntype", "surface",
                   "adjunct").toPandas())
    C = list(got.columns)
    a = got.astype({"turn_idx": "int64", "sent_idx": "int64"}) \
           .sort_values(C).reset_index(drop=True)
    b = gold.astype({"turn_idx": "int64", "sent_idx": "int64"}) \
            .sort_values(C).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b)
