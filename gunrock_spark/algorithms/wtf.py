"""WTF (who-to-follow) — PPR → circle of trust → SALSA relevance.

Re-creates the reference's 3-phase WTF (gunrock/app/wtf/wtf_enactor.cuh;
CPU spec ReferenceWTF, tests/wtf/test_wtf.cu:178-316):

1. PageRank phase ("PPR Time", wtf_enactor.cuh:375): rank vertices.
   (The CPU reference runs plain PR for max_iter; the GPU personalizes
   from ``src`` — we expose both via ``personalized``.)
2. Circle of Trust = top ``min(1000, n)`` vertices by rank, stable
   (rank desc, v asc) (wtf_enactor.cuh:398-399; CUBRadixSort).
3. SALSA-style relevance for ``1/alpha + 1`` rounds over the CoT's
   out-edges (test_wtf.cu:266-302), with the reference's exact
   quirks:
     - cot_indeg[x] = number of CoT->x edges (test_wtf.cu:255-263)
     - refscore[x] += sum_{u in CoT, (u,x) in E} rank[u]/out_deg(u)
       where out_deg is the FULL out-degree; refscore of NON-CoT
       vertices accumulates across rounds, CoT members' refscore is
       re-zeroed each round except the last (test_wtf.cu:298-301)
     - rank[u in CoT] = alpha*[u==src]
         + sum_{(u,x) in E} (1-alpha)*refscore[x]/cot_indeg[x]
       (test_wtf.cu:285-296); rank of CoT zeroed first.
   Output: refscore per vertex, sorted (refscore desc, v asc).

Scale shape: the CoT is <=1000 rows — broadcast on every join; the
only |E|-sized work is the one semi-join extracting CoT out-edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.graph.edge_table import EdgeTable


def who_to_follow(
    graph: EdgeTable,
    src: int,
    alpha: float = 0.2,
    delta: float = 0.85,
    error: float = 0.01,
    max_iter: int = 50,
    cot_size: int = 1000,
    personalized: bool = True,
) -> DataFrame:
    """Returns DataFrame[v, refscore] (all vertices; non-CoT-reachable
    carry 0.0), ordered refscore desc, v asc."""
    spark = graph.edges.sparkSession
    edges = graph.edges

    # -- phase 1: (P)PR ------------------------------------------------
    pr = pagerank(
        graph,
        delta=delta,
        threshold=error,
        max_iter=max_iter,
        src=src if personalized else None,
    )
    ranks = pr.state.select("v", "rank")

    # -- phase 2: circle of trust (top-k by rank, stable) ---------------
    n = graph.num_vertices()
    k = min(cot_size, n)
    cot = (
        ranks.orderBy(F.desc("rank"), F.asc("v")).limit(k)
        .select("v", "rank")
        .localCheckpoint(eager=True)
    )
    # CoT out-edges with the member's FULL out-degree
    cot_edges = (
        F.broadcast(cot.select("v"))
        .join(edges, cot["v"] == edges["src"])
        .select(edges["src"].alias("u"), edges["dst"].alias("x"))
        .localCheckpoint(eager=True)
    )
    full_outdeg = graph.degrees.select(F.col("v").alias("u"), "out_degree")
    cot_indeg = cot_edges.groupBy("x").agg(F.count(F.lit(1)).alias("cot_indeg"))

    # -- phase 3: SALSA relevance rounds --------------------------------
    # rank restarts as the src indicator (test_wtf.cu:245 rank[i] =
    # (i==src)?1:0; GPU: memset 0 + rank_curr[src]=1,
    # wtf_enactor.cuh:435-462) — the PR ranks only ordered the CoT.
    salsa_iter = int(1.0 / alpha) + 1
    rank = cot.select(
        "v",
        F.when(F.col("v") == src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("rank"),
    )
    refscore = spark.createDataFrame([], schema="x long, refscore double")
    cot_ids = cot.select(F.col("v").alias("cx"))
    for it in range(salsa_iter):
        # refscore[x] += sum over CoT edges of rank[u]/out_deg(u)
        add = (
            cot_edges.join(F.broadcast(rank.withColumnRenamed("v", "u")), "u")
            .join(F.broadcast(full_outdeg), "u")
            .groupBy("x")
            .agg(F.sum(F.col("rank") / F.col("out_degree")).alias("add"))
        )
        refscore = (
            refscore.join(add, refscore["x"] == add["x"], "full")
            .select(
                F.coalesce(refscore["x"], add["x"]).alias("x"),
                (
                    F.coalesce(F.col("refscore"), F.lit(0.0))
                    + F.coalesce(F.col("add"), F.lit(0.0))
                ).alias("refscore"),
            )
            .localCheckpoint(eager=False)
        )
        # rank[u in CoT] = alpha*[u==src] + sum (1-alpha)*refscore[x]/cot_indeg[x]
        gather = (
            cot_edges.join(refscore, "x")
            .join(cot_indeg, "x")
            .groupBy("u")
            .agg(
                F.sum(
                    F.lit(1.0 - alpha) * F.col("refscore") / F.col("cot_indeg")
                ).alias("gathered")
            )
        )
        rank = (
            cot.select("v")
            .join(gather.withColumnRenamed("u", "v"), "v", "left")
            .select(
                "v",
                (
                    F.when(F.col("v") == src, F.lit(alpha)).otherwise(F.lit(0.0))
                    + F.coalesce("gathered", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        if it + 1 < salsa_iter:
            # zero CoT members' refscore (reference quirk, test_wtf.cu:298)
            refscore = refscore.join(
                cot_ids, refscore["x"] == cot_ids["cx"], "left_anti"
            ).localCheckpoint(eager=False)
    out = (
        graph.vertices.join(
            refscore.select(F.col("x").alias("v"), "refscore"), "v", "left"
        )
        .select("v", F.coalesce("refscore", F.lit(0.0)).alias("refscore"))
        .orderBy(F.desc("refscore"), F.asc("v"))
    )
    return out
