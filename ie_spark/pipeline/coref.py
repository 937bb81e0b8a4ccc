"""Cross-sentence pronoun resolution (nearest-antecedent baseline).

The reference's DRT binds a pronoun to the most recent ACCESSIBLE referent
in the discourse (``drt/drs.py`` merge semantics; pronoun lexemes carry a
binding obligation, ``semantics/lexeme.py:29-76``).  Lifted to corpus
scale: for each pronoun mention, the antecedent is the most recent
propername mention in an EARLIER sentence of the same conversation.

Scale design: the antecedent join is bounded by ``lookback_turns`` so the
per-conversation join fan-out is O(pronouns × names-in-window), never the
whole mega-conversation; the shuffle key is conv_id (already the pipeline's
partitioning key) and the top-1 is a window over the unique mention_id.
Recency ties inside one sentence break on the lexicographically smallest
stem — deterministic and reproducible from golden fixtures, which carry no
token positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# pronouns that corefer with a person-like antecedent; 'it/this' would
# need an entity-type model — out of the nearest-name baseline
PERSON_PRONOUNS = ("he", "she", "they", "him", "her", "them")


def resolve_pronouns(mentions: DataFrame,
                     lookback_turns: int = 10) -> DataFrame:
    """mentions → (conv_id, turn_idx, sent_idx, pronoun, antecedent,
    ant_turn, ant_sent); antecedent is NULL when no propername precedes
    the pronoun within the lookback window."""
    pron = (mentions.filter((F.col("kind") == "pronoun")
                            & F.col("stem").isin(*PERSON_PRONOUNS))
            .select("conv_id", "turn_idx", "sent_idx", "mention_id",
                    F.col("stem").alias("pronoun")))
    names = (mentions.filter(F.col("kind") == "propername")
             .select(F.col("conv_id").alias("_a_conv"),
                     F.col("turn_idx").alias("ant_turn"),
                     F.col("sent_idx").alias("ant_sent"),
                     F.col("stem").alias("antecedent"))
             .distinct())
    earlier = ((F.col("ant_turn") < F.col("turn_idx"))
               | ((F.col("ant_turn") == F.col("turn_idx"))
                  & (F.col("ant_sent") < F.col("sent_idx"))))
    in_window = (F.col("turn_idx") - F.col("ant_turn")) <= lookback_turns
    # window/earlier conditions live IN the left join so a pronoun with no
    # admissible antecedent keeps one NULL row
    j = pron.join(names, (F.col("conv_id") == F.col("_a_conv"))
                  & earlier & in_window, "left").drop("_a_conv")
    w = Window.partitionBy("mention_id").orderBy(
        F.desc("ant_turn"), F.desc("ant_sent"), F.asc("antecedent"))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("conv_id", "turn_idx", "sent_idx", "pronoun",
                    "antecedent", "ant_turn", "ant_sent"))
