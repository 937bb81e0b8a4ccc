"""Entity linking: blocked similarity join against a broadcast candidate
dictionary (north rule; replaces the reference's live wikipedia/google
search, ``semantics/ccg.py:1919-1994`` / ``core/sentence.py:915-1000``).

Plan shape:
  mentions (big)  ⋈broadcast  candidates (small, exploded aliases)
      on block_key (normalized first token)           ← equi-join, no shuffle
  → similarity score (prefix ratio, reference ccg.py:1898-1906 semantics)
  → top-1 per mention occurrence via row_number window

Skew: the join side is broadcast, so hot mention stems cause no shuffle
skew; the top-1 window partitions by the (unique) mention_id, so partitions
are tiny by construction.  The only skew risk is a block_key matching
thousands of candidates — bounded by capping aliases per block at dictionary
build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ie_spark.data.synthetic import CITIES, NAMES, NOUNS


def _block_key(col):
    """Normalized blocking key: first 4 chars of the lowercase first token.
    Prefix blocking lets near-miss surface forms ('Alic') reach the scorer
    while keeping block fanout tiny; both sides of the join use the same
    function, so blocks always align."""
    first_tok = F.split(F.regexp_replace(col, "-", " "), " ").getItem(0)
    return F.substring(F.lower(first_tok), 1, 4)


def build_candidate_rows() -> list[tuple[str, str, list[str], str, int]]:
    """Raw deterministic KB rows (entity_id, name, aliases, category,
    pageid) — pure Python so the DuckDB correctness oracle can consume the
    identical KB.  category/pageid mirror the reference's wikidata payload
    (title/categories/pageid, core/sentence.py:30-63)."""
    rows = []
    for i, n in enumerate(NAMES):
        rows.append((f"P{i:04d}", n, [n, n.lower(), n.upper()],
                     "person", 1000 + i))
    for i, (surf, stem) in enumerate(CITIES):
        rows.append((f"C{i:04d}", stem, [stem, surf, surf.lower()],
                     "location", 2000 + i))
    for i, n in enumerate(NOUNS):
        rows.append((f"N{i:04d}", n, [n, n + "s", n.capitalize()],
                     "thing", 3000 + i))
    # distractors: near-miss names that must NOT win top-1 on exact aliases
    for i, n in enumerate(["Alicia", "Roberto", "Annabel", "Davide"]):
        rows.append((f"D{i:04d}", n, [n, n.lower()], "person", 4000 + i))
    return rows


def kb_metadata(spark: SparkSession) -> DataFrame:
    """(entity_id, entity_name, category, pageid) — the KB payload joined
    onto canonical nodes (reference core/sentence.py:30-63 shape)."""
    rows = [(eid, name, cat, pid)
            for (eid, name, _aliases, cat, pid) in build_candidate_rows()]
    return spark.createDataFrame(
        rows, "entity_id string, entity_name string, category string, "
              "pageid int")


def build_candidate_dict(spark: SparkSession,
                         extra: list[tuple[str, str, list[str]]] | None = None
                         ) -> DataFrame:
    """Deterministic KB candidate dictionary (entity_id, name, alias,
    block_key) — one row per alias.  Built from the synthetic vocabulary
    plus distractors (FIXTURES.md §4); swap for a real KB table at scale.
    """
    rows = [r[:3] for r in build_candidate_rows()]
    rows.extend(extra or [])
    df = spark.createDataFrame(rows, "entity_id string, name string, aliases array<string>")
    return (df.select("entity_id", "name", F.explode("aliases").alias("alias"))
              .withColumn("block_key", _block_key(F.col("alias")))
              .withColumn("alias_norm", F.lower(F.regexp_replace("alias", "-", " ")))
              # KB metadata carried onto linked mentions (reference attaches
              # wikidata title/pageid/url, core/sentence.py:30-63)
              .withColumn("kb_url", F.concat(F.lit("kb://entity/"),
                                             F.col("entity_id"))))


def link_mentions(mentions: DataFrame, candidates: DataFrame,
                  min_score: float = 0.5) -> DataFrame:
    """mentions × broadcast candidates → (mention cols, entity_id, score).

    Score: 1.0 exact alias match, else longest-common-prefix ratio
    (computed JVM-side via levenshtein on truncated strings — no UDF).
    Top-1 per mention_id via row_number.
    """
    m = (mentions
         .filter(F.col("kind").isin("entity", "propername"))
         .withColumn("stem_norm", F.lower(F.regexp_replace("stem", "-", " ")))
         .withColumn("block_key", _block_key(F.col("stem"))))

    j = m.join(F.broadcast(candidates), on="block_key", how="left")

    # prefix-ratio similarity (the reference's scoring, ccg.py:1898-1906:
    # longest common prefix / max length), exact-match shortcut, all
    # JVM-side: LCP via an aggregate over zipped character arrays
    eqs = F.zip_with(F.split(F.col("stem_norm"), ""),
                     F.split(F.col("alias_norm"), ""),
                     lambda x, y: x.eqNullSafe(y))
    lcp = F.aggregate(
        eqs,
        F.struct(F.lit(0).alias("n"), F.lit(True).alias("go")),
        lambda acc, eq: F.struct(
            (acc["n"] + F.when(acc["go"] & eq, 1).otherwise(0)).alias("n"),
            (acc["go"] & eq).alias("go")),
    )["n"]
    maxlen = F.greatest(F.length("stem_norm"), F.length("alias_norm"))
    score = (
        F.when(F.col("alias_norm").isNull(), F.lit(None))
        .when(F.col("stem_norm") == F.col("alias_norm"), F.lit(1.0))
        .otherwise(lcp / maxlen)
    )
    j = j.withColumn("score", score)

    w = Window.partitionBy("mention_id").orderBy(
        F.desc_nulls_last("score"), F.asc("entity_id"))
    top = (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    return (top.withColumn(
                "entity_id",
                F.when(F.col("score") >= min_score, F.col("entity_id")))
               .withColumn(
                "score",
                F.when(F.col("entity_id").isNotNull(), F.col("score")))
               .withColumn(
                "entity_name",
                F.when(F.col("entity_id").isNotNull(), F.col("name")))
               .withColumn(
                "kb_url",
                F.when(F.col("entity_id").isNotNull(), F.col("kb_url")))
               .select("conv_id", "turn_idx", "sent_idx", "mention_id",
                       "surface", "stem", "kind", "ref", "entity_id", "score",
                       "entity_name", "kb_url"))
