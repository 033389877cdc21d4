"""SALSA — stochastic approach for link-structure analysis.

Re-creates the reference's SALSA (gunrock/app/salsa/): hub/authority
ranks over the bipartite random walk. Init (salsa_problem.cuh:
366-372): hub = 1/out_nodes, auth = 1/in_nodes (counts of vertices
with out-/in-degree > 0). Per iteration, fixed ``max_iter`` rounds:

    hub_i[u]  = sum_{(u,v) in E} sum_{(w,v) in E}
                  hub_{i-1}[w] / (in_deg(v) * out_deg(w))
                                (HBACKWARDFunctor::ApplyEdge,
                                 salsa_functor.cuh:168-170)
    auth_i[v] = sum_{(u,v) in E} sum_{(u,x) in E}
                  auth_{i-1}[x] / (out_deg(u) * in_deg(x))
                                (ABACKWARDFunctor::ApplyEdge,
                                 salsa_functor.cuh:319-321)

Factored into two linear passes each (no quadratic wedge join):
    t[v]     = sum_{w->v} hub[w]/out_deg(w);  hub'[u] = sum_{u->v} t[v]/in_deg(v)
    s[u]     = sum_{u->x} auth[x]/in_deg(x);  auth'[v] = sum_{u->v} s[u]/out_deg(u)
— 4 join+agg per iteration over |E| rows, identical math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def salsa(graph: EdgeTable, max_iter: int = 20) -> IterationResult:
    """Result state: (v long, hub double, auth double)."""
    spark = graph.edges.sparkSession
    edges = graph.edges
    rev = graph.reversed_layout().edges
    deg = graph.degrees

    out_nodes = deg.where(F.col("out_degree") > 0).count()
    in_nodes = deg.where(F.col("in_degree") > 0).count()

    state = deg.select(
        "v",
        F.lit(1.0 / out_nodes).alias("hub"),
        F.lit(1.0 / in_nodes).alias("auth"),
    ).repartition(spark.sparkContext.defaultParallelism, "v").localCheckpoint(eager=True)

    def step(cur: DataFrame, i: int):
        cur = cur.join(deg, "v").select(
            "v", "hub", "auth", "out_degree", "in_degree"
        )
        # e2/e3 are joined on the ORIGINAL dst — use the cached
        # reversed (CSC) layout, which is partitioned+sorted by that
        # key, instead of re-shuffling |E| rows by dst per iteration
        e1 = edges.select(F.col("src").alias("s1"), F.col("dst").alias("d1"))
        e2 = rev.select(F.col("src").alias("d2"), F.col("dst").alias("s2"))
        e3 = rev.select(F.col("src").alias("d3"), F.col("dst").alias("s3"))
        e4 = edges.select(F.col("src").alias("s4"), F.col("dst").alias("d4"))
        # hub pass: t[v] = sum_{w->v} hub[w]/outdeg(w), then
        # hub'[u] = sum_{u->v} t[v]/indeg(v)
        t = (
            cur.join(e1, cur["v"] == e1["s1"])
            .groupBy(F.col("d1").alias("tv"))
            .agg(F.sum(F.col("hub") / F.col("out_degree")).alias("t"))
        )
        hub_new = (
            t.join(deg.select(F.col("v").alias("tv"), "in_degree"), "tv")
            .join(e2, F.col("tv") == e2["d2"])
            .groupBy(F.col("s2").alias("hv"))
            .agg(F.sum(F.col("t") / F.col("in_degree")).alias("nhub"))
        )
        # auth pass: s[u] = sum_{u->x} auth[x]/indeg(x), then
        # auth'[v] = sum_{u->v} s[u]/outdeg(u)
        s = (
            cur.join(e3, cur["v"] == e3["d3"])
            .groupBy(F.col("s3").alias("sv"))
            .agg(F.sum(F.col("auth") / F.col("in_degree")).alias("s"))
        )
        auth_new = (
            s.join(deg.select(F.col("v").alias("sv"), "out_degree"), "sv")
            .join(e4, F.col("sv") == e4["s4"])
            .groupBy(F.col("d4").alias("av"))
            .agg(F.sum(F.col("s") / F.col("out_degree")).alias("nauth"))
        )
        new = (
            cur.select("v")
            .join(hub_new, cur["v"] == hub_new["hv"], "left")
            .join(auth_new, cur["v"] == auth_new["av"], "left")
            .select(
                "v",
                F.coalesce("nhub", F.lit(0.0)).alias("hub"),
                F.coalesce("nauth", F.lit(0.0)).alias("auth"),
            )
        )
        return new, {"edges_traversed": 4 * graph.num_edges()}

    return iterate(state, step, stop=lambda m: False, max_iter=max_iter)
