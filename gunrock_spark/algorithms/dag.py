"""DAG longest-path layering (topological levels) — the companion of
the condensation quotient: once cycles are contracted away
(algorithms/scc.py + graph/coarsen.py), every dependency/ordering
analysis over the super-graph needs each vertex's level,

    level(v) = 0                      if v has no in-edges
    level(v) = 1 + max level(u)       over in-edges (u, v)

i.e. the longest path from any source — the critical-path layering of
scheduling theory. The reference has no DAG primitive (its apps are
all cyclic-graph fixpoints); this is the engine's forward extension
for condensation consumers.

Algorithm: monotone relaxation, the exact frontier-loop shape of
widest_paths (one equi-join + one partial max-agg per round, only
improved vertices re-enter the frontier); converges in depth(DAG)
rounds. All-integer, so a recursive SQL oracle replays the table
exactly.

Input contract: the edge set MUST be acyclic (e.g. a condensation, or
a src < dst forward subgraph). A cycle never converges — the loop
then stops at ``max_iter`` with ``improved > 0`` in the final
metrics, which callers should treat as a cyclicity signal.

Scale shape (100 TB condensation): per round one |E|-row equi-join
against the |V|-row state + map-side-combined max — no windows, no
Python, no driver-side vertex loop; lineage cut per round by the
iterate driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def dag_levels(
    edges: DataFrame | EdgeTable, max_iter: int = 10_000
) -> IterationResult:
    """IterationResult whose state is (v long, level long, active
    boolean): topological levels of an acyclic edge set (columns
    src, dst; an :class:`EdgeTable` is accepted and contributes its
    cleaned edges)."""
    if isinstance(edges, EdgeTable):
        edges = edges.edges
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    spark = e.sparkSession
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    state = verts.select(
        "v", F.lit(0).cast("long").alias("level"), F.lit(True).alias("active")
    )
    state = state.repartition(
        spark.sparkContext.defaultParallelism, "v"
    ).localCheckpoint(eager=True)

    def step(cur: DataFrame, i: int):
        frontier = cur.where(F.col("active"))
        cand = (
            frontier.join(e, frontier["v"] == e["src"])
            .select(e["dst"].alias("nv"), (F.col("level") + 1).alias("nlev"))
            .groupBy("nv")
            .agg(F.max("nlev").alias("nlev"))
        )
        new = cur.join(cand, cur["v"] == cand["nv"], "left").select(
            "v",
            F.greatest(
                F.col("level"), F.coalesce(F.col("nlev"), F.lit(0))
            ).alias("level"),
            F.coalesce(F.col("nlev") > F.col("level"), F.lit(False)).alias(
                "active"
            ),
        )

        def metrics(materialized: DataFrame) -> dict:
            improved = materialized.where(F.col("active")).count()
            return {"improved": improved, "edges_traversed": improved}

        return new, metrics

    return iterate(
        state, step, stop=lambda m: m["improved"] == 0, max_iter=max_iter
    )
