"""Link prediction: common-neighbor and Adamic-Adar scoring.

The reference's wedge machinery (the TC join pattern,
gunrock/util/join.cuh) stops at counting closed triangles; link
prediction scores the OPEN wedges — for every non-adjacent pair
(u, v) with common neighbors, how strongly the graph "wants" the
edge. Scores (Liben-Nowell & Kleinberg, CIKM 2003):

    cn(u, v) = |N(u) ∩ N(v)|
    aa(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))   (Adamic-Adar)

over the symmetrized (undirected) neighborhood.

Shape: one wedge self-join through each common neighbor w (u < v
canonicalizes the pair), one partial-agg groupBy to fold the per-w
contributions, one anti-join to drop already-existing edges, then a
TakeOrdered top-k (per-partition heads merged on the driver — no
global sort materialization).

Scale notes (100 TB link graph): wedge volume is Σ_w deg(w)², which a
10⁷-degree hub turns into 10¹⁴ rows. ``max_center_degree`` prunes
hub CENTERS before the self-join — the exact analog of the Jaccard
join's stop-shingle cap (pipeline/dedup.py) — and is principled for
AA specifically: a center's per-pair contribution is 1/ln(deg), so
the pruned hubs contribute the least signal per row (a web-scale run
prunes, say, deg > 10⁴ centers and loses < 1/ln(10⁴) ≈ 0.11 per
pair). The cap is part of the result contract (the SQL oracle applies
the same cap), not a silent truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def link_prediction_scores(
    graph: EdgeTable, max_center_degree: int = 1024
) -> DataFrame:
    """DataFrame[u, v, cn long, aa double] for every non-adjacent
    pair (u < v) sharing >= 1 common neighbor of degree <=
    ``max_center_degree``. ``aa`` uses the center's FULL symmetric
    degree (the cap only prunes which centers expand)."""
    sym = graph.symmetrized().edges.select("src", "dst")
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    centers = (
        sym.join(deg, "src")
        .where(F.col("d") <= max_center_degree)
        .select(F.col("src").alias("w"), F.col("dst").alias("u"), "d")
    )
    right = centers.select(F.col("w").alias("w2"), F.col("u").alias("v"))
    pairs = centers.join(
        right, (centers["w"] == right["w2"]) & (centers["u"] < right["v"])
    ).select("u", "v", "d")
    scored = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))).alias("aa"),
    )
    # drop pairs already linked: sym holds both directions, u < v, so
    # one (u=src, v=dst) anti-join covers the undirected edge.
    return scored.join(
        sym,
        (scored["u"] == sym["src"]) & (scored["v"] == sym["dst"]),
        "left_anti",
    )


def adamic_adar_topk(
    graph: EdgeTable, k: int = 50, max_center_degree: int = 1024
) -> DataFrame:
    """Top-k predicted links: DataFrame[u, v, cn, aa] ordered by
    (rounded aa desc, u, v) — the rounded score is the sort key so
    the top-k set is reproducible across engines (float-sum ulps
    can't reorder ties)."""
    s = link_prediction_scores(graph, max_center_degree=max_center_degree)
    return (
        s.select("u", "v", "cn", F.round("aa", 6).alias("aa"))
        .orderBy(F.desc("aa"), "u", "v")
        .limit(k)
    )
