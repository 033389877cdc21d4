"""Link prediction: common-neighbor, Adamic-Adar, resource-allocation,
Jaccard, and preferential-attachment scoring.

The reference's wedge machinery (the TC join pattern,
gunrock/util/join.cuh) stops at counting closed triangles; link
prediction scores the OPEN wedges — for every non-adjacent pair
(u, v) with common neighbors, how strongly the graph "wants" the
edge. Scores (Liben-Nowell & Kleinberg, CIKM 2003; Zhou/Lü/Zhang,
EPJ B 2009 for RA):

    cn(u, v)  = |N(u) ∩ N(v)|
    aa(u, v)  = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))   (Adamic-Adar)
    ra(u, v)  = Σ_{w ∈ N(u) ∩ N(v)} 1 / deg(w)       (resource alloc.)
    jac(u, v) = cn / (deg(u) + deg(v) − cn)           (Jaccard)
    pa(u, v)  = deg(u) · deg(v)                       (pref. attach.)

over the symmetrized (undirected) neighborhood. All five come out of
ONE wedge join + ONE groupBy + two |candidates|-row degree joins —
pa/jac reuse the degree table the wedge pass already built, so the
extra scores are marginal-cost.

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
    """DataFrame[u, v, cn long, aa double, ra double, jaccard double,
    pa long] for every non-adjacent pair (u < v) sharing >= 1 common
    neighbor of degree <= ``max_center_degree``. ``aa``/``ra`` use the
    center's FULL symmetric degree (the cap only prunes which centers
    expand); ``jaccard``/``pa`` use the endpoints' full degrees, joined
    from the degree table the wedge pass already built."""
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
        F.sum(F.lit(1.0) / F.col("d").cast("double")).alias("ra"),
    )
    # drop pairs already linked: sym holds both directions, u < v, so
    # one (u=src, v=dst) anti-join covers the undirected edge.
    open_pairs = scored.join(
        sym,
        (scored["u"] == sym["src"]) & (scored["v"] == sym["dst"]),
        "left_anti",
    )
    du = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("d").alias("dv"))
    return (
        open_pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            "aa",
            "ra",
            (
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn"))
            ).alias("jaccard"),
            (F.col("du") * F.col("dv")).cast("long").alias("pa"),
        )
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


def cocitation_topk(
    graph: EdgeTable, k: int = 50, max_fanout: int = 1024
) -> DataFrame:
    """Top-k co-cited page pairs: DataFrame[u, v, cocite long] with
    ``cocite(u, v) = |{w : w->u and w->v}|`` — pages frequently linked
    together by the same source (Small 1973's co-citation measure on
    the DIRECTED link graph; the symmetric-neighborhood scores in
    :func:`link_prediction_scores` are the undirected cousins).

    Shape: one self-join of the out-adjacency through the citing page
    ``w`` (u < v canonicalizes), one partial-agg groupBy, TakeOrdered
    top-k. Scale: pair volume is sum_w outdeg(w)^2, so link-farm pages
    with 10^5 outlinks are pruned by ``max_fanout`` BEFORE the
    self-join — part of the result contract (the oracle applies the
    same cap), the same principled hub cap as Adamic-Adar's
    ``max_center_degree`` (a 10^4-outlink page "co-cites" everything,
    carrying no pair signal).

    Ordering: (cocite desc, u, v) — integer score, fully deterministic.
    """
    e = graph.edges.select("src", "dst")
    fan = e.groupBy("src").agg(F.count(F.lit(1)).alias("fan"))
    cite = (
        e.join(fan, "src")
        .where(F.col("fan") <= max_fanout)
        .select(F.col("src").alias("w"), F.col("dst").alias("u"))
    )
    right = cite.select(F.col("w").alias("w2"), F.col("u").alias("v"))
    pairs = cite.join(
        right, (cite["w"] == right["w2"]) & (cite["u"] < right["v"])
    ).select("u", "v")
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cocite"))
        .orderBy(F.desc("cocite"), "u", "v")
        .limit(k)
    )


def bibliographic_coupling_topk(
    graph: EdgeTable, k: int = 50, max_fanin: int = 1024
) -> DataFrame:
    """Top-k bibliographically-coupled pairs: DataFrame[u, v, coupling
    long] with ``coupling(u, v) = |{w : u->w and v->w}|`` — pages that
    cite the same targets (Kessler 1963), the out-link dual of
    co-citation. The shared TARGET ``w`` is the join pivot, so the hub
    cap prunes targets with in-degree > ``max_fanin`` (everything
    links to the homepage; those shared targets carry no signal).
    Ordering: (coupling desc, u, v)."""
    e = graph.edges.select("src", "dst")
    fanin = e.groupBy("dst").agg(F.count(F.lit(1)).alias("fin"))
    cited = (
        e.join(fanin, "dst")
        .where(F.col("fin") <= max_fanin)
        .select(F.col("dst").alias("w"), F.col("src").alias("u"))
    )
    right = cited.select(F.col("w").alias("w2"), F.col("u").alias("v"))
    pairs = cited.join(
        right, (cited["w"] == right["w2"]) & (cited["u"] < right["v"])
    ).select("u", "v")
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("coupling"))
        .orderBy(F.desc("coupling"), "u", "v")
        .limit(k)
    )


def link_prediction_topk(
    graph: EdgeTable,
    k: int = 50,
    by: str = "jaccard",
    max_center_degree: int = 1024,
) -> DataFrame:
    """Top-k candidate links by any score column (``cn``/``aa``/``ra``/
    ``jaccard``/``pa``): DataFrame[u, v, cn, aa, ra, jaccard, pa] with
    float columns rounded to 6 places and the ROUNDED score as the
    sort key (reproducible across engines), ties broken (u, v)."""
    s = link_prediction_scores(graph, max_center_degree=max_center_degree)
    out = s.select(
        "u",
        "v",
        "cn",
        F.round("aa", 6).alias("aa"),
        F.round("ra", 6).alias("ra"),
        F.round("jaccard", 6).alias("jaccard"),
        "pa",
    )
    if by not in out.columns[2:]:
        raise ValueError(f"unknown score column {by!r}")
    return out.orderBy(F.desc(by), "u", "v").limit(k)
