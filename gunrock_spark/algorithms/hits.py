"""HITS — the reference fork's personalized hub/authority diffusion.

This fork's HITS (gunrock/app/hits/) is NOT textbook HITS: ranks init
to ZERO (hits_problem.cuh:327-330), "NormalizeRank" is just a
swap+zero (hits_enactor.cuh:93-113), and the hub update carries a
personalization seed at ``src``. Per iteration (enactor order:
AUTH advance over the CSC, swap, HUB advance over the CSR, swap —
hits_enactor.cuh:220-303):

    auth_i[v] = sum_{u->v} hub_{i-1}[u] / max(out_deg(u), 1)
                                      (AUTHFunctor::ApplyEdge,
                                       hits_functor.cuh:165-166)
    hub_i[u]  = [u == src and out_deg(u) > 0] * delta
              + (1-delta) * sum_{u->v} auth_i[v] / in_deg(v)
                                      (HUBFunctor::ApplyEdge,
                                       hits_functor.cuh:91-92 — the
                                       delta/out_deg(src) per-edge term
                                       sums to delta over src's edges)

Runs a fixed ``max_iter`` (hits_enactor.cuh:311). Two joins + two
aggregations per iteration; the degree table is the cached EdgeTable
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def hits(
    graph: EdgeTable,
    src: int,
    delta: float = 0.85,
    max_iter: int = 20,
) -> IterationResult:
    """Result state: (v long, hub double, auth double)."""
    spark = graph.edges.sparkSession
    edges = graph.edges
    deg = graph.degrees  # (v, out_degree, in_degree), cached

    state = deg.select(
        "v", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
    ).repartition(spark.sparkContext.defaultParallelism, "v").localCheckpoint(eager=True)

    # the HUB advance runs over the CSC (join keyed on original dst);
    # the cached reversed layout is partitioned+sorted by that key, so
    # per iteration only the |V|-row state shuffles — joining the raw
    # edge table on dst would re-shuffle |E| rows every iteration
    rev = graph.reversed_layout().edges

    def step(cur: DataFrame, i: int):
        cur = cur.select("v", "hub", "auth")
        e1 = edges.select(F.col("src").alias("s1"), F.col("dst").alias("d1"))
        e2 = rev.select(F.col("src").alias("d2"), F.col("dst").alias("s2"))
        # auth_i[v] = sum over in-edges of hub/max(out_deg,1)
        hub_side = cur.join(deg.select("v", "out_degree"), "v")
        auth_msgs = (
            hub_side.join(e1, hub_side["v"] == e1["s1"])
            .groupBy(F.col("d1").alias("av"))
            .agg(
                F.sum(
                    F.col("hub") / F.greatest(F.col("out_degree"), F.lit(1)).cast("double")
                ).alias("nauth")
            )
        )
        with_auth = (
            cur.join(auth_msgs, cur["v"] == auth_msgs["av"], "left")
            .select("v", "hub", F.coalesce("nauth", F.lit(0.0)).alias("auth"))
        )
        # hub_i[u] = seed + (1-delta) * sum over out-edges of auth_i[v]/in_deg(v)
        auth_side = with_auth.join(deg.select("v", "in_degree"), "v")
        hub_msgs = (
            auth_side.join(e2, auth_side["v"] == e2["d2"])
            .groupBy(F.col("s2").alias("hv"))
            .agg(F.sum(F.col("auth") / F.col("in_degree")).alias("msg"))
        )
        new = (
            with_auth.join(hub_msgs, with_auth["v"] == hub_msgs["hv"], "left")
            .join(deg.select("v", "out_degree"), "v")
            .select(
                "v",
                (
                    F.when(
                        (F.col("v") == src) & (F.col("out_degree") > 0), F.lit(delta)
                    ).otherwise(F.lit(0.0))
                    + F.lit(1.0 - delta) * F.coalesce("msg", F.lit(0.0))
                ).alias("hub"),
                "auth",
            )
        )
        return new, {"edges_traversed": 2 * graph.num_edges()}

    return iterate(state, step, stop=lambda m: False, max_iter=max_iter)
