"""BFS — frontier-based breadth-first search.

Re-creates the reference's BFS semantics (gunrock/app/bfs/):
per-iteration frontier advance setting ``labels[dst] = label`` on
first visit (bfs_functor.cuh:57-80) and optionally recording a
predecessor (``MARK_PREDECESSORS``, bfs_functor.cuh:96-118). The
reference's predecessor is whichever thread wins the atomic; ours is
the MINIMUM parent id among the discovering frontier — deterministic,
still a valid BFS tree (documented deviation, pinned by oracles).

Spark plan per iteration (SURVEY.md §2.2 BFS row):
    frontier = state where depth == i          (|frontier| rows)
    cand     = frontier ⋈ edges on v = src     (broadcast when small —
               AQE picks it; the direction-optimization analog)
    grouped  = cand.groupBy(dst).agg(min(src)) (dedup + det. pred)
    new      = grouped anti-join state         (unvisited only)
    state    = state ∪ new(depth = i+1)
Stop when the new frontier is empty (the reference's zero
queue_length stop).

The visited set IS the state DataFrame — the analog of the
reference's visited bitmask (problem_base.cuh:413); the anti-join is
the cull filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def bfs(
    graph: EdgeTable,
    source: int,
    max_depth: int = 10_000,
    mark_predecessors: bool = False,
    broadcast_threshold: int = 1_000_000,
) -> IterationResult:
    """BFS from ``source``. Result state: (v long, depth long
    [, pred long]) — reached vertices only; source has depth 0 and
    pred NULL.

    Direction-optimization analog (reference: predicted-visits
    push/pull switch, bfs_enactor.cuh:852-933): the driver KNOWS the
    frontier size from the previous iteration's metrics, so while it
    is under ``broadcast_threshold`` rows the frontier side is
    broadcast (edges never shuffle — the push regime); past it the
    join falls back to the shuffle plan (the pull/huge-frontier
    regime, where scanning all edges is the right cost model).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges
    frontier_size = {"rows": 1}

    state = spark.createDataFrame(
        [(int(source), 0, None)], schema="v long, depth long, pred long"
    )
    if not mark_predecessors:
        state = state.select("v", "depth")
    state = state.localCheckpoint(eager=True)

    def step(cur: DataFrame, i: int):
        frontier = cur.where(F.col("depth") == i).select("v")
        if frontier_size["rows"] <= broadcast_threshold:
            frontier = F.broadcast(frontier)
        cand = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .groupBy(edges["dst"].alias("nv"))
            .agg(F.min(edges["src"]).alias("npred"))
        )
        new = (
            cand.join(cur, cand["nv"] == cur["v"], "left_anti")
            .select(
                F.col("nv").alias("v"),
                F.lit(i + 1).cast("long").alias("depth"),
                F.col("npred").alias("pred"),
            )
        )
        if not mark_predecessors:
            new = new.select("v", "depth")
        out = cur.unionByName(new)

        def metrics(materialized: DataFrame) -> dict:
            n = materialized.where(F.col("depth") == i + 1).count()
            frontier_size["rows"] = n  # feeds the next push/pull choice
            return {"frontier": n, "edges_traversed": n}

        return out, metrics

    return iterate(
        state, step, stop=lambda m: m["frontier"] == 0, max_iter=max_depth
    )
