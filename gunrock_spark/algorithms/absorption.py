"""k-step absorption probability to a trusted seed set.

``absorb_k(v)`` = probability that a uniform random walk started at
``v`` reaches the seed set S within k steps (seeds absorb: once in S
the walk stays). The link-spam / trust signal dual to TrustRank's
forward propagation: TrustRank pushes trust OUT of the seeds along
links; absorption measures how quickly a page's outlinks FUNNEL INTO
the trusted core — a page whose walks rarely hit S within a few hops
lives in a spam-farm periphery (Gyongyi et al., VLDB 2004, spam mass;
public knowledge).

Exact truncated recurrence (no sampling)::

    p_0(v) = 1                       if v in S else 0
    p_t(v) = 1                       if v in S
           = sum_{(v,u) in E} p_{t-1}(u) / outdeg(v)   otherwise
    (dangling non-seed pages: p_t = 0 — the walk halts outside S)

Each of the k rounds is one |E|-row equi-join on the PRE-AGGREGATED
nonzero state + one map-side-combinable groupBy — the advance +
fused-reduce shape every primitive here uses (reference analog:
edge_map_forward advance, gunrock/oprtr/edge_map_forward/cta.cuh,
re-expressed as join+agg per SURVEY §4). State rows with p = 0 are
dropped between rounds, so early rounds touch only the k-hop
in-neighborhood of S, not all |V| — the frontier property. k is tiny
(2–8); no convergence loop, no driver-side collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def absorption_probability(
    graph: EdgeTable, seeds: Sequence[int], k: int = 4
) -> DataFrame:
    """DataFrame[v, absorb_p] over all vertices (zeros included), with
    ``absorb_p`` the k-step absorption probability into ``seeds``.
    Seeds is a small id list (trusted whitelist), broadcast-joined."""
    spark = graph.edges.sparkSession
    seed_df = spark.createDataFrame(
        [(int(s),) for s in seeds], "v long"
    ).distinct()
    edges = graph.edges.select("src", "dst")
    outdeg = graph.degrees.select("v", "out_degree")

    # nonzero-state frontier: seeds at p=1
    state = seed_df.select("v", F.lit(1.0).alias("p"))
    is_seed = F.broadcast(seed_df.select("v", F.lit(True).alias("_s")))
    for _ in range(k):
        pulled = (
            edges.join(state, edges["dst"] == state["v"])
            .groupBy("src")
            .agg(F.sum("p").alias("mass"))
        )
        state = (
            pulled.join(outdeg, pulled["src"] == outdeg["v"])
            .select(
                F.col("v"), (F.col("mass") / F.col("out_degree")).alias("p")
            )
            .join(is_seed, "v", "left")
            .where(F.col("_s").isNull())  # seeds stay absorbed at 1
            .select("v", "p")
            .unionByName(seed_df.select("v", F.lit(1.0).alias("p")))
            .localCheckpoint(eager=True)
        )
    return (
        graph.vertices.join(state, "v", "left")
        .select(
            "v",
            F.round(F.coalesce(F.col("p"), F.lit(0.0)), 9).alias("absorb_p"),
        )
    )
