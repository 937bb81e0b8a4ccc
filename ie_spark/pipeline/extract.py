"""Spark wrapper for the per-turn extraction core.

Architecture (Spark-first, SURVEY.md §7.1 step 3):

- The transcript scan is a plain columnar read; only (conv_id, turn_idx,
  text) are selected before the UDF so Catalyst prunes every other column
  at the source (ReadSchema).
- Extraction is ``mapInPandas`` — Arrow-batched, no per-row Python at the
  Spark API level, **no shuffle**: per-turn extraction is embarrassingly
  parallel, so the plan is scan → project → mapInPandas, which scales
  linearly with executors (the north rule's N→4N efficiency comes free
  because there is no exchange to serialize).
- Conversation-level operations (checkpointing, graph building) that DO
  group by conv_id go through ``repartition_by_conv`` which hash-partitions
  with optional salting for mega-conversations (SURVEY.md §4 custom work #1).

Reference parity: output schemas mirror SURVEY.md §1.2; the extraction
semantics live in ie_spark.extraction.extractor (reference citations there).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ie_spark.extraction.pandas_api import extract_batch

TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])

MENTION_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("sent_idx", IntegerType()),
    StructField("mention_id", StringType()),
    StructField("surface", StringType()),
    StructField("stem", StringType()),
    StructField("kind", StringType()),
    StructField("ref", StringType()),
])

TRIPLE_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("sent_idx", IntegerType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("subj_ref", StringType()),
    StructField("event_ref", StringType()),
    StructField("obj_ref", StringType()),
    StructField("polarity", StringType()),
    StructField("modal", StringType()),   # reference _MODAL (lexeme.py:683)
    StructField("role", StringType()),    # ARG1 theme | ARG2 recipient/obl
    StructField("prep", StringType()),    # oblique preposition
])

# single-pass combined output (mentions + triples discriminated by 'rec'),
# so a full pipeline run extracts once and splits at the sink
COMBINED_SCHEMA = StructType(
    [StructField("rec", StringType())]
    + [f for f in TRIPLE_SCHEMA.fields]
    + [StructField("mention_id", StringType()),
       StructField("surface", StringType()),
       StructField("stem", StringType()),
       StructField("kind", StringType()),
       StructField("ref", StringType())]
)


def _mentions_to_combined(m: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({
        "rec": "m",
        "conv_id": m["conv_id"], "turn_idx": m["turn_idx"],
        "sent_idx": m["sent_idx"],
        "subj": None, "pred": None, "obj": None,
        "subj_ref": None, "event_ref": None, "obj_ref": None,
        "polarity": None, "modal": None, "role": None, "prep": None,
        "mention_id": m["mention_id"], "surface": m["surface"],
        "stem": m["stem"], "kind": m["kind"], "ref": m["ref"],
    })
    return out


def _triples_to_combined(t: pd.DataFrame) -> pd.DataFrame:
    out = t.copy()
    out.insert(0, "rec", "t")
    for c in ("mention_id", "surface", "stem", "kind", "ref"):
        out[c] = None
    return out


def _select_text(transcripts: DataFrame) -> DataFrame:
    # ship the package to executors (UDF closures import ie_spark) and
    # prune columns before the UDF → parquet scan reads 3 columns only
    from ie_spark.session import ship_package
    ship_package(transcripts.sparkSession)
    return transcripts.select("conv_id", "turn_idx", "text")


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """transcripts → triples table (scan → mapInPandas, shuffle-free)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _, triples = extract_batch(pdf)
            yield triples

    return _select_text(transcripts).mapInPandas(fn, schema=TRIPLE_SCHEMA)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts → mentions table (scan → mapInPandas, shuffle-free)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mentions, _ = extract_batch(pdf)
            yield mentions

    return _select_text(transcripts).mapInPandas(fn, schema=MENTION_SCHEMA)


CONSTITUENT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("sent_idx", IntegerType()),
    StructField("vntype", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("adjunct", BooleanType()),
    StructField("surface", StringType()),
])


def extract_constituents_df(transcripts: DataFrame) -> DataFrame:
    """transcripts → constituent phrase table (NP/VP/S_INF/ADJP/ADVP/PP
    spans with adjunct marking — the reference's constituent output,
    core/sentence.py:218-321 refined by ccg.py:783-989)."""
    from ie_spark.extraction.extractor import extract_constituents
    from ie_spark.textproc.preprocess import split_sentences

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"].values, pdf["turn_idx"].values,
                    pdf["text"].values):
                for si, sent in enumerate(split_sentences(text or "")):
                    for (t, s, e, adj, surf) in extract_constituents(sent):
                        rows.append((conv_id, int(turn_idx), si,
                                     t, s, e, adj, surf))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_idx",
                "vntype", "start", "end", "adjunct", "surface"])

    return _select_text(transcripts).mapInPandas(fn, schema=CONSTITUENT_SCHEMA)


def extract_vn_view_df(transcripts: DataFrame) -> DataFrame:
    """transcripts → the reference's flat *VerbNet sentence* phrase view
    (``get_verbnet_sentence()``, semantics/ccg.py — reference C11): one
    row per phrase, PP rows carrying only their preposition, attributive
    adjuncts folded into their phrase (see extractor.verbnet_view)."""
    from ie_spark.extraction.extractor import verbnet_view
    from ie_spark.textproc.preprocess import split_sentences

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"].values, pdf["turn_idx"].values,
                    pdf["text"].values):
                for si, sent in enumerate(split_sentences(text or "")):
                    for (t, surf) in verbnet_view(sent):
                        rows.append((conv_id, int(turn_idx), si, t, surf))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_idx", "vntype", "surface"])

    return _select_text(transcripts).mapInPandas(
        fn, schema=("conv_id string, turn_idx int, sent_idx int, "
                    "vntype string, surface string"))


def extract_vn_trees_df(transcripts: DataFrame) -> DataFrame:
    """transcripts → (conv_id, turn_idx, sent_idx, tree) where ``tree``
    is the repr of the reference-style nested constituent tree over the
    VerbNet-view node indices (``get_constituent_tree()``,
    core/sentence.py; see extractor.verbnet_tree)."""
    from ie_spark.extraction.extractor import verbnet_tree
    from ie_spark.textproc.preprocess import split_sentences

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"].values, pdf["turn_idx"].values,
                    pdf["text"].values):
                for si, sent in enumerate(split_sentences(text or "")):
                    try:
                        t = verbnet_tree(sent)
                    except Exception as e:  # noqa: BLE001 — row isolation
                        # dead-letter semantics as everywhere else: one
                        # malformed sentence must never abort the job
                        rows.append((conv_id, int(turn_idx), si,
                                     f"_error:{type(e).__name__}"))
                        continue
                    rows.append((conv_id, int(turn_idx), si,
                                 repr(t) if t is not None else None))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_idx", "tree"])

    return _select_text(transcripts).mapInPandas(
        fn, schema=("conv_id string, turn_idx int, sent_idx int, "
                    "tree string"))


def extract_dependencies_df(transcripts: DataFrame) -> DataFrame:
    """transcripts → (conv_id, turn_idx, sent_idx, tok_idx, token, head)
    word-level dependency rows — the reference's per-lexeme ``.head``
    output (``get_dependency_tree``, core/sentence.py:439; head
    conventions verified against test/exec_test.py token assertions).
    The root token has head == tok_idx.  Same single Arrow pass / zero
    exchanges as the other extraction surfaces."""
    from ie_spark.extraction.extractor import dependency_rows
    from ie_spark.textproc.preprocess import split_sentences

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"].values, pdf["turn_idx"].values,
                    pdf["text"].values):
                for si, sent in enumerate(split_sentences(text or "")):
                    try:
                        toks, heads = dependency_rows(sent)
                    except Exception:  # noqa: BLE001 — row isolation
                        rows.append((conv_id, int(turn_idx), si,
                                     -1, "_error", -1))
                        continue
                    for ti, (tok, h) in enumerate(zip(toks, heads)):
                        rows.append((conv_id, int(turn_idx), si,
                                     ti, tok, int(h)))
            yield pd.DataFrame(rows, columns=[
                "conv_id", "turn_idx", "sent_idx", "tok_idx", "token",
                "head"])

    return _select_text(transcripts).mapInPandas(
        fn, schema=("conv_id string, turn_idx int, sent_idx int, "
                    "tok_idx int, token string, head int"))


def extract_all(transcripts: DataFrame) -> DataFrame:
    """Single-pass extraction of mentions AND triples into one discriminated
    long table ('rec' = 'm'|'t').  Use when materializing both sinks: one
    scan + one UDF pass, split with cheap filters afterwards (ideally after
    a write, so the UDF is not re-executed per branch)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mentions, triples = extract_batch(pdf)
            yield pd.concat(
                [_triples_to_combined(triples), _mentions_to_combined(mentions)],
                ignore_index=True)

    return _select_text(transcripts).mapInPandas(fn, schema=COMBINED_SCHEMA)


def split_combined(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Discriminated extraction output → (mentions_df, triples_df)."""
    mentions = combined.filter(F.col("rec") == "m").select(
        *[f.name for f in MENTION_SCHEMA.fields])
    triples = combined.filter(F.col("rec") == "t").select(
        *[f.name for f in TRIPLE_SCHEMA.fields])
    return mentions, triples


def repartition_by_conv(df: DataFrame, num_partitions: int,
                        salt_buckets: int = 0,
                        hot_convs: list[str] | None = None) -> DataFrame:
    """Hash-repartition by conv_id with optional salting of hot keys.

    AQE cannot salt a groupBy key by itself (SURVEY.md §4); for
    mega-conversations (10^8-turn conv_ids at the 10^12 scale) callers pass
    the hot conv_ids from a cheap first-pass count and per-turn salt spreads
    them over ``salt_buckets`` partitions.
    """
    if salt_buckets and hot_convs:
        salted = F.when(
            F.col("conv_id").isin(hot_convs),
            F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)),
        ).otherwise(F.lit(0))
        return (df.withColumn("_salt", salted)
                  .repartition(num_partitions, "conv_id", "_salt")
                  .drop("_salt"))
    return df.repartition(num_partitions, "conv_id")


def find_hot_convs(transcripts: DataFrame, threshold: int) -> list[str]:
    """First-pass frequency scan for skew salting (count per conv_id)."""
    rows = (transcripts.groupBy("conv_id").count()
            .filter(F.col("count") >= threshold)
            .select("conv_id").collect())
    return [r[0] for r in rows]


def transcripts_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Create a transcripts DataFrame with the canonical schema.

    Columns are selected by NAME (createDataFrame maps positionally, which
    silently mis-assigns reordered frames)."""
    pdf = pdf[[f.name for f in TRANSCRIPT_SCHEMA.fields]]
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering with a dense per-conversation
    row_number — the input_hint's 'per-turn text equality under stable turn
    ordering' invariant check."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.withColumn("turn_rank", F.row_number().over(w))
