"""Canonicalization: connected components over the mention–entity graph.

Mirrors the reference's disjoint-span closure (`get_disjoint_drs_spans`,
``semantics/ccg.py:1822-1861`` — DFS over shared referents) lifted to corpus
scale: vertices are mention stems and KB entity ids; edges are

  - mention → linked entity (from ie_spark.pipeline.linking)
  - _AKA alias pairs (appositives, ``ccg.py:1073-1183``)
  - _POSS is NOT an identity edge (ownership ≠ sameness)

Algorithm: iterative min-label propagation over DataFrames (HashToMin
style), early-stopping on a converged count and ``localCheckpoint`` to
truncate lineage — no GraphFrames dependency.  The mention–entity graph is
near-bipartite and shallow (SURVEY.md §7.3), so convergence is a handful of
iterations; each iteration is one shuffle on the vertex id, which AQE
coalesces as components collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_identity_edges(linked_mentions: DataFrame,
                         triples: DataFrame) -> DataFrame:
    """→ edges (src, dst) over node keys.

    Node key: 'E:<entity_id>' for KB entities, 'M:<stem>' for mention stems.
    """
    link_edges = (linked_mentions
                  .filter(F.col("entity_id").isNotNull())
                  .select(F.concat(F.lit("M:"), F.col("stem")).alias("src"),
                          F.concat(F.lit("E:"), F.col("entity_id")).alias("dst")))
    # alias identity edges carry ONLY corpus-unambiguous aliases: an
    # alias stem naming more than one distinct referent ('player' for
    # both Robbie and Serena) is a common-noun description, and
    # keeping it percolates — measured on a 2000-conv corpus, stem-level
    # _AKA edges collapsed every propername into one 72-stem component.
    # The filter is self-scaling: at 10^12 turns nearly every common
    # noun becomes ambiguous and drops out, while genuinely unique
    # descriptions ('the Dutch publishing group' → Elsevier) survive.
    # Shuffle cost: one groupBy on the alias stem + an anti-join — the
    # same key the edges shuffle on anyway.
    aka = (triples.filter(F.col("pred") == "_AKA")
           .select("subj", "obj").distinct())
    ambiguous = (aka.groupBy("obj")
                 .agg(F.count_distinct("subj").alias("n_ref"))
                 .filter(F.col("n_ref") > 1)
                 .select("obj"))
    aka_edges = (aka.join(ambiguous, "obj", "left_anti")
                 .select(F.concat(F.lit("M:"), F.col("subj")).alias("src"),
                         F.concat(F.lit("M:"), F.col("obj")).alias("dst")))
    return link_edges.unionByName(aka_edges).distinct()


def connected_components_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm).  Converges in O(log n) rounds even on
    long chains and *shrinks* the edge set as it runs, unlike plain label
    propagation whose every round joins the full edge set — this is the
    10^12-scale path.

    large-star: per node u, link every neighbor v > u to m = min(N(u) ∪ u)
    small-star: orient edges large→small; per node u, link u and every
                neighbor v ≤ u to m

    → (node, component) with component = min node key (same contract as
    ``connected_components``)."""
    # canonical orientation: keep pairs as (big, small)
    e = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct().localCheckpoint())

    for _ in range(max_iter):
        # ---- large-star ----
        # neighborhoods over symmetric edges
        sym = e.select("u", "v").union(e.select(F.col("v").alias("u"),
                                                F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (sym.join(m, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v")))
        e1 = large.distinct()
        # ---- small-star ----
        sym1 = e1.select("u", "v")  # already oriented u > v by construction
        m2 = sym1.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        small = (sym1.join(m2, "u")
                 .select(F.col("v").alias("a"), F.col("m").alias("b"))
                 .union(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
                 .filter(F.col("a") != F.col("b"))
                 .select(F.greatest("a", "b").alias("u"),
                         F.least("a", "b").alias("v"))
                 .distinct())
        new_e = small.localCheckpoint()
        changed = (new_e.exceptAll(e).limit(1).count()
                   + e.exceptAll(new_e).limit(1).count())
        e = new_e
        if changed == 0:
            break

    # at convergence every node points at its component min
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (e.select(F.col("v").alias("node")).distinct()
             .join(e.select(F.col("u").alias("node")).distinct(),
                   "node", "left_anti")
             .withColumn("component", F.col("node")))
    return labels.unionByName(roots).distinct()


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges (src, dst) → (node, component) with component = min node key
    in the component (deterministic canonical representative).

    Iterative min-label propagation; each round:
      label(n) = min(label(n), min over neighbors' labels)
    stop when no label changes.  O(diameter) rounds; our graphs are shallow.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    labels = (sym.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("component", F.col("node")))

    for _ in range(max_iter):
        # neighbor labels: join edges with labels on dst, min per src
        neigh = (sym.join(labels.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src").agg(F.min("component").alias("n_comp"))
                 .withColumnRenamed("src", "node"))
        new_labels = (labels.join(neigh, "node", "left")
                      .select("node",
                              F.least(F.col("component"),
                                      F.coalesce(F.col("n_comp"),
                                                 F.col("component")))
                              .alias("component")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_nodes(labels: DataFrame, linked_mentions: DataFrame,
                    kb: DataFrame | None = None) -> DataFrame:
    """components + mention metadata → nodes(node_id, canonical, kind,
    entity_id, kb_url[, entity_name, category, pageid]).

    node_id = component representative (min node key; 'E:' sorts before
    'M:', so a component containing a KB entity is represented by its
    smallest entity id — exposed as entity_id/kb_url metadata, mirroring
    the reference's wikidata attachment, core/sentence.py:30-63);
    canonical = the (deterministically smallest) mention stem.  When a
    ``kb`` frame (entity_id, entity_name, category, pageid) is supplied,
    the full payload joins on (broadcast — the KB is dimension-sized).
    """
    stems = (linked_mentions
             .select(F.concat(F.lit("M:"), F.col("stem")).alias("node"),
                     F.col("stem"), F.col("kind"))
             .distinct())
    joined = labels.join(stems, "node", "left")
    ent = F.when(F.col("component").startswith("E:"),
                 F.expr("substring(component, 3)"))
    nodes = (joined.groupBy("component")
             .agg(F.min("stem").alias("canonical"),
                  F.max("kind").alias("kind"))
             .select(F.col("component").alias("node_id"), "canonical",
                     "kind", ent.alias("entity_id"),
                     F.when(ent.isNotNull(),
                            F.concat(F.lit("kb://entity/"), ent))
                     .alias("kb_url")))
    if kb is not None:
        nodes = nodes.join(F.broadcast(kb), "entity_id", "left").select(
            "node_id", "canonical", "kind", "entity_id", "kb_url",
            "entity_name", "category", "pageid")
    return nodes


def canonical_mention_map(labels: DataFrame) -> DataFrame:
    """→ (stem, node_id) map for rewriting triple endpoints."""
    return (labels
            .filter(F.col("node").startswith("M:"))
            .select(F.expr("substring(node, 3)").alias("stem"),
                    F.col("component").alias("node_id")))
