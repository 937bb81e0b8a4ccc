"""Cross-sentence pronoun resolution (nearest-antecedent baseline).

The reference's DRT binds a pronoun to the most recent ACCESSIBLE referent
in the discourse (``drt/drs.py`` merge semantics; pronoun lexemes carry a
binding obligation, ``semantics/lexeme.py:29-76``).  Lifted to corpus
scale: for each pronoun mention, the antecedent is the most recent
propername mention in an EARLIER sentence of the same conversation.

Scale design (round-2 verdict #5): the join's equi-key is (conv_id,
turn-BUCKET) with bucket = floor(turn_idx / lookback) — each pronoun
probes its own and the previous bucket, which together cover every turn
within the lookback window.  Within-key fan-out is therefore bounded by
names-in-two-buckets = O(window), even for a mega-conversation where a
conv_id-only key would enumerate pronouns × ALL names.  The lookback and
ordering conditions stay as residual predicates on the hash join.
Recency ties inside one sentence break on the lexicographically smallest
stem — deterministic and reproducible from golden fixtures, which carry no
token positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# kind-aware antecedent filter (round-2 verdict #10): person pronouns
# bind the nearest PROPERNAME; impersonal it/this/these/those bind the
# nearest common-noun ENTITY mention — the mention `kind` column is the
# entity-type signal
PERSON_PRONOUNS = ("he", "she", "they", "him", "her", "them")
IMPERSONAL_PRONOUNS = ("it", "this", "these", "those")


def _candidate_pairs(mentions: DataFrame, lookback_turns: int) -> DataFrame:
    """Pronoun × admissible-antecedent candidate rows (pre-top-1).

    Exposed for the fan-out property test: the row count must scale as
    O(pronouns × names-in-window), not O(pronouns × names-in-conv)."""
    want_kind = (F.when(F.col("stem").isin(*PERSON_PRONOUNS),
                        F.lit("propername"))
                 .otherwise(F.lit("entity")))
    pron = (mentions.filter(
                (F.col("kind") == "pronoun")
                & F.col("stem").isin(*(PERSON_PRONOUNS
                                       + IMPERSONAL_PRONOUNS)))
            .select("conv_id", "turn_idx", "sent_idx", "mention_id",
                    F.col("stem").alias("pronoun"),
                    want_kind.alias("_want_kind"))
            # probe own + previous turn-bucket: covers every antecedent
            # with turn_idx in [turn_idx - lookback, turn_idx]
            .withColumn("_bucket", F.explode(F.array(
                F.floor(F.col("turn_idx") / lookback_turns),
                F.floor(F.col("turn_idx") / lookback_turns) - 1))))
    names = (mentions.filter(F.col("kind").isin("propername", "entity"))
             .select(F.col("conv_id").alias("_a_conv"),
                     F.col("kind").alias("_a_kind"),
                     F.col("turn_idx").alias("ant_turn"),
                     F.col("sent_idx").alias("ant_sent"),
                     F.col("stem").alias("antecedent"))
             .distinct()
             .withColumn("_a_bucket",
                         F.floor(F.col("ant_turn") / lookback_turns)))
    earlier = ((F.col("ant_turn") < F.col("turn_idx"))
               | ((F.col("ant_turn") == F.col("turn_idx"))
                  & (F.col("ant_sent") < F.col("sent_idx"))))
    in_window = (F.col("turn_idx") - F.col("ant_turn")) <= lookback_turns
    # window/earlier conditions live IN the left join so a pronoun with no
    # admissible antecedent keeps NULL rows (deduped by the top-1 window)
    return (pron.join(names, (F.col("conv_id") == F.col("_a_conv"))
                      & (F.col("_want_kind") == F.col("_a_kind"))
                      & (F.col("_bucket") == F.col("_a_bucket"))
                      & earlier & in_window, "left")
            .drop("_a_conv", "_a_kind", "_a_bucket", "_bucket",
                  "_want_kind"))


def resolve_pronouns(mentions: DataFrame,
                     lookback_turns: int = 10) -> DataFrame:
    """mentions → (conv_id, turn_idx, sent_idx, pronoun, antecedent,
    ant_turn, ant_sent); antecedent is NULL when no propername precedes
    the pronoun within the lookback window."""
    j = _candidate_pairs(mentions, lookback_turns)
    # DESC NULLS LAST: a real antecedent always beats the probe-miss NULL
    # rows; two all-NULL rows are identical so the top-1 is deterministic
    w = Window.partitionBy("mention_id").orderBy(
        F.desc("ant_turn"), F.desc("ant_sent"), F.asc("antecedent"))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("conv_id", "turn_idx", "sent_idx", "pronoun",
                    "antecedent", "ant_turn", "ant_sent"))
