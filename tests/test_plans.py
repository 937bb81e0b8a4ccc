"""Physical-plan quality gates: the plans we designed for are the plans
Catalyst actually produces (pushdown, pruning, broadcast, shuffle-freedom).
These guard against perf regressions that row-level tests can't see."""

import __spark_entry__ as entrymod
from ie_spark.data.synthetic import corpus_to_pandas
from ie_spark.pipeline.extract import extract_triples, transcripts_from_pandas


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_extraction_is_shuffle_free(spark):
    tr, _, _ = corpus_to_pandas(n_convs=5, seed=1)
    df = extract_triples(transcripts_from_pandas(spark, tr))
    plan = _plan(df)
    assert "Exchange" not in plan, f"extraction must not shuffle:\n{plan}"
    assert "MapInPandas" in plan


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = entrymod.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"\
        in plan
    # column pruning: untouched wide columns are not read
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = entrymod.queries()["q5_nation_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_linking_join_is_broadcast(spark):
    from ie_spark.pipeline.extract import extract_mentions
    from ie_spark.pipeline.linking import build_candidate_dict, link_mentions
    tr, _, _ = corpus_to_pandas(n_convs=5, seed=1)
    mentions = extract_mentions(transcripts_from_pandas(spark, tr))
    linked = link_mentions(mentions, build_candidate_dict(spark))
    assert "BroadcastHashJoin" in _plan(linked)


def test_doc_stats_single_scan_no_shuffle(spark, sf_dir):
    df = entrymod.queries()["doc_quality"](spark, sf_dir)
    plan = _plan(df)
    # per-row stats are pure projections: scan → project → sort only
    assert plan.count("Scan parquet") == 1
    assert "HashAggregate" not in plan


def test_extract_all_is_one_udf_pass_no_shuffle(spark):
    """Single-pass combined extraction: exactly ONE MapInPandas, zero
    exchanges (the discriminated split happens after materialization)."""
    from ie_spark.pipeline.extract import extract_all
    tr, _, _ = corpus_to_pandas(n_convs=5, seed=1)
    plan = _plan(extract_all(transcripts_from_pandas(spark, tr)))
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_coref_join_not_nested_loop(spark):
    """The antecedent join has an equi component (conv_id) — it must plan
    as a hash/sort-merge join with the range conditions as residuals,
    never a nested loop."""
    from ie_spark.pipeline.coref import resolve_pronouns
    from ie_spark.pipeline.extract import extract_mentions
    tr, _, _ = corpus_to_pandas(n_convs=5, seed=1)
    plan = _plan(resolve_pronouns(
        extract_mentions(transcripts_from_pandas(spark, tr))))
    assert "NestedLoop" not in plan
