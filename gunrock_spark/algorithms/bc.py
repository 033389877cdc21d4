"""Betweenness centrality — Brandes forward/backward passes.

Re-creates the reference's BC (gunrock/app/bc/): forward BFS
accumulating shortest-path counts ``sigma[dst] += sigma[src]``
(bc_functor.cuh:37-96, atomicAdd at :71); backward pass per level
accumulating ``delta[src] += sigma[src]/sigma[dst] * (1 + delta[dst])``
and bc values (bc_functor.cuh:168-239). The reference enacts one
source at a time (bc_enactor.cuh:465-534 forward, :732+ backward) and
loops over sources for full BC; so do we.

Spark plan:
  forward:  level-synchronous BFS where the frontier carries sigma;
            groupBy(dst).agg(sum(sigma), min depth) — one shuffle per
            level; state (v, depth, sigma) is the whole BFS DAG.
  backward: loop level = deepest-1 .. 0:
            children = state@level+1 with (sigma_c, delta_c)
            delta[p in level] = sum over edges p->c of
                sigma_p/sigma_c * (1 + delta_c)
            one join + one aggregate per level.
Like the reference, bc_values exclude the source; for undirected
graphs each pair is counted twice (halve externally if you want the
textbook value — the reference's CPU check scales the same way,
tests/bc/test_bc.cu).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def _forward(graph: EdgeTable, source: int) -> tuple[DataFrame, int]:
    """Level-synchronous sigma-BFS. Returns (dag(v, depth, sigma),
    max_depth)."""
    spark = graph.edges.sparkSession
    edges = graph.edges
    state = spark.createDataFrame(
        [(int(source), 0, 1.0)], schema="v long, depth int, sigma double"
    ).localCheckpoint(eager=True)
    depth = 0
    while True:
        frontier = state.where(F.col("depth") == depth)
        cand = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .groupBy(edges["dst"].alias("nv"))
            .agg(F.sum("sigma").alias("nsigma"))
        )
        new = cand.join(state, cand["nv"] == state["v"], "left_anti").select(
            F.col("nv").alias("v"),
            F.lit(depth + 1).cast("int").alias("depth"),
            F.col("nsigma").alias("sigma"),
        )
        state = state.unionByName(new).localCheckpoint(eager=False)
        if state.where(F.col("depth") == depth + 1).limit(1).count() == 0:
            return state, depth
        depth += 1


def bc_single_source(graph: EdgeTable, source: int) -> DataFrame:
    """Per-vertex dependency scores from one source:
    DataFrame[v, bc] over ALL vertices (0.0 where unreached/source)."""
    edges = graph.edges
    dag, max_depth = _forward(graph, source)
    dag = dag.persist()
    dag.count()
    # deltas per level, deepest first; leaves start at 0
    deltas = dag.select("v", "depth", "sigma", F.lit(0.0).alias("delta"))
    for level in range(max_depth - 1, -1, -1) if max_depth > 0 else []:
        children = deltas.where(F.col("depth") == level + 1).select(
            F.col("v").alias("cv"),
            F.col("sigma").alias("csigma"),
            F.col("delta").alias("cdelta"),
        )
        contrib = (
            edges.join(children, edges["dst"] == children["cv"])
            .groupBy(edges["src"].alias("pv"))
            .agg(
                F.sum(
                    (F.lit(1.0) + F.col("cdelta")) / F.col("csigma")
                ).alias("ratio_sum")
            )
        )
        deltas = (
            deltas.join(contrib, deltas["v"] == contrib["pv"], "left")
            .select(
                "v",
                "depth",
                "sigma",
                F.when(
                    F.col("depth") == level,
                    F.col("sigma") * F.coalesce("ratio_sum", F.lit(0.0)),
                ).otherwise(F.col("delta")).alias("delta"),
            )
            .localCheckpoint(eager=False)
        )
    result = (
        graph.vertices.join(
            deltas.where(F.col("v") != source).select("v", F.col("delta").alias("bc")),
            "v",
            "left",
        )
        .select("v", F.coalesce("bc", F.lit(0.0)).alias("bc"))
    )
    dag.unpersist()
    return result


def betweenness_centrality(
    graph: EdgeTable, sources: list[int] | None = None
) -> DataFrame:
    """BC summed over ``sources`` (default: all vertices — O(V) BFS
    passes, sample for large graphs, matching the reference test's
    single-source default, tests/bc/test_bc.cu:86-88)."""
    if sources is None:
        sources = [r["v"] for r in graph.vertices.collect()]
    total: DataFrame | None = None
    for s in sources:
        one = bc_single_source(graph, s)
        if total is None:
            total = one
        else:
            total = (
                total.join(one.withColumnRenamed("bc", "bc2"), "v")
                .select("v", (F.col("bc") + F.col("bc2")).alias("bc"))
                .localCheckpoint(eager=False)
            )
    return total
