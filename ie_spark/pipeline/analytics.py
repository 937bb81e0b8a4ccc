"""Graph-analytics consumers of the materialized node/edge tables.

The reference materializes its graph for downstream consumption (blob
sink + service reads, ``grpc/infox.py``; node/edge shape per SURVEY §2.C)
but ships no analytics pass of its own — these are the first queries any
graph consumer runs on the materialized tables, expressed Spark-first so
they hold at 10^12-turn scale:

- ``degree_profile``: per-node in/out edge and distinct-neighbor counts.
  Two hash aggregations on the edge endpoints (map-side partial counts,
  one shuffle each on node id) + a full-outer merge — no joins against
  the raw corpus, cost is O(|E|).
- ``two_hop_paths``: (a → mid → c) reachability counts via a self-join of
  the distinct-pair edge list on ``mid``.  The classic scale hazard is a
  hub intermediate (a node with d_in·d_out pairs fans out quadratically);
  intermediates whose distinct in- or out-neighbor count exceeds
  ``max_fanout`` are excluded via an anti-join — same hot-set pattern as
  the repeated-line cap in operators/dedup.py (line_dedup), and like it
  the hub set is NOT force-broadcast: its size is bounded only by
  2·|pairs|/max_fanout, which is tiny on real graphs (AQE picks a
  broadcast anti on its own) but unbounded in |E|, so a mandatory hint
  could OOM the driver at exactly the scale the cap exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_profile(edges: DataFrame, sort: bool = True) -> DataFrame:
    """edges(src, dst, ...) → one row per node with degree counts.

    Columns: node, out_degree, out_neighbors, in_degree, in_neighbors,
    total_degree.  With ``sort`` (default) the output carries a
    deterministic total order (degree desc, node asc) for cross-engine
    comparison; pass ``sort=False`` when a downstream consumer doesn't
    need it — the global sort is a full range-shuffle of the output.
    """
    # both endpoint aggregations consume the projection; a lazy local
    # checkpoint runs the upstream lineage once (line_dedup pattern —
    # the two exchanges have different children, so no ReusedExchange)
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    out_d = (edges.groupBy(F.col("src").alias("node"))
             .agg(F.count("*").alias("out_degree"),
                  F.countDistinct("dst").alias("out_neighbors")))
    in_d = (edges.groupBy(F.col("dst").alias("node"))
            .agg(F.count("*").alias("in_degree"),
                 F.countDistinct("src").alias("in_neighbors")))
    out = (out_d.join(in_d, "node", "full_outer")
           .select("node",
                   F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                   F.coalesce("out_neighbors", F.lit(0)).alias("out_neighbors"),
                   F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
                   F.coalesce("in_neighbors", F.lit(0)).alias("in_neighbors"))
           .withColumn("total_degree",
                       F.col("out_degree") + F.col("in_degree")))
    return out.orderBy(F.desc("total_degree"), F.asc("node")) if sort else out


def two_hop_paths(edges: DataFrame, max_fanout: int = 1000,
                  sort: bool = True) -> DataFrame:
    """edges(src, dst, ...) → (src, dst, n_mid) two-hop reachability.

    ``n_mid`` counts DISTINCT intermediate nodes connecting src to dst
    over the distinct-pair edge list (self-loops dropped; round trips
    src→mid→src excluded).  Intermediates with more than ``max_fanout``
    distinct in- or out-neighbors are excluded — a hub cap that bounds
    the join fan-out at d_in·d_out ≤ max_fanout² per intermediate instead
    of letting one mega-node produce a quadratic pair explosion.  The
    anti-join against the hub set is unhinted (see module docstring);
    ``sort=False`` skips the global output sort.
    """
    # four branches consume the pair list (both hub-degree aggregations
    # and both join sides) — lazy local checkpoint = one distinct pass
    pairs = (edges.select("src", "dst")
             .filter(F.col("src") != F.col("dst"))
             .distinct().localCheckpoint(eager=False))
    hub = (pairs.groupBy(F.col("dst").alias("node"))
           .agg(F.countDistinct("src").alias("d"))
           .unionByName(pairs.groupBy(F.col("src").alias("node"))
                        .agg(F.countDistinct("dst").alias("d")))
           .groupBy("node").agg(F.max("d").alias("d"))
           .filter(F.col("d") > max_fanout)
           .select("node"))
    a = (pairs.join(hub, pairs.dst == hub.node, "left_anti")
         .select(F.col("src").alias("a_src"), F.col("dst").alias("mid")))
    b = pairs.select(F.col("src").alias("mid"), F.col("dst").alias("b_dst"))
    out = (a.join(b, "mid")
           .filter(F.col("a_src") != F.col("b_dst"))
           .groupBy(F.col("a_src").alias("src"), F.col("b_dst").alias("dst"))
           .agg(F.countDistinct("mid").alias("n_mid")))
    return (out.orderBy(F.desc("n_mid"), F.asc("src"), F.asc("dst"))
            if sort else out)
