"""BFS — frontier-based breadth-first search with direction
optimization (push/pull).

Re-creates the reference's BFS semantics (gunrock/app/bfs/):
per-iteration frontier advance setting ``labels[dst] = label`` on
first visit (bfs_functor.cuh:57-80) and optionally recording a
predecessor (``MARK_PREDECESSORS``, bfs_functor.cuh:96-118). The
reference's predecessor is whichever thread wins the atomic; ours is
the MINIMUM parent id among the discovering frontier — deterministic,
still a valid BFS tree (documented deviation, pinned by oracles).

Direction optimization re-creates the reference's predicted-visits
push/pull switch (bfs_enactor.cuh:852-933; pull advance :1014+): on a
web graph, 2–3 middle BFS levels hold most of |V|, and scanning the
huge frontier's out-edges (push) costs far more than scanning the
small unvisited set's in-edges (pull). The driver knows the frontier
and visited sizes from the previous iteration's metrics, so the
regime choice is free.

Spark plan per iteration (SURVEY.md §2.2 BFS row):

push (frontier small relative to unvisited):
    frontier = state where depth == i          (|frontier| rows)
    cand     = frontier ⋈ edges on v = src     (broadcast when small)
    grouped  = cand.groupBy(dst).agg(min(src)) (dedup + det. pred)
    new      = grouped anti-join state         (unvisited only)
Shuffle volume ~ out-edges of the frontier.

pull (frontier has most of |V|):
    unvisited = vertices anti-join state       (small at mid levels)
    cand      = unvisited ⋈ reverse-edges      (in-neighbors;
                broadcast unvisited when small — edges never move)
    new       = cand ⋈ frontier membership → groupBy(v).min(nbr)
Shuffle volume ~ in-edges of the unvisited set. Any visited
in-neighbor of a vertex unvisited at level i must sit at depth
exactly i (else the vertex would already be visited), so joining
against the depth-i frontier finds precisely the BFS parents and
min(nbr) matches the push regime's min(src) predecessor.

The reverse-edge table (the CSC mirror the reference keeps for its
backward advance, csr.cuh:127-154) is ``EdgeTable.reversed_layout()``
— built once per graph, hash-partitioned + sorted by its src,
persisted — so every pull join (across levels AND across bfs calls on
the same graph) reuses the cached layout.

Stop when the new frontier is empty (the reference's zero
queue_length stop). The visited set IS the state DataFrame — the
analog of the reference's visited bitmask (problem_base.cuh:413); the
anti-join is the cull filter.
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
    direction_optimized: bool = True,
    pull_alpha: float = 1.0,
) -> IterationResult:
    """BFS from ``source``. Result state: (v long, depth long
    [, pred long]) — reached vertices only; source has depth 0 and
    pred NULL.

    Regime choice per iteration (the reference's do_a/do_b heuristic,
    bfs_enactor.cuh:852-933, driven here by driver-side metrics): pull
    when ``frontier > pull_alpha * unvisited`` — i.e. when scanning
    the unvisited set's in-edges beats scanning the frontier's
    out-edges. ``direction_optimized=False`` forces pure push. Within
    the push regime, a frontier under ``broadcast_threshold`` rows is
    broadcast (edges never shuffle); within pull, the unvisited side
    is broadcast under the same threshold. Each iteration's metrics
    record the regime used (``regime: push|pull``).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges
    n_vertices = graph.num_vertices() if direction_optimized else None
    sizes = {"frontier": 1, "visited": 1}
    # CSC mirror, built once PER GRAPH (cached on the EdgeTable like
    # symmetrized()): the first pull-regime BFS pays the one-time
    # reverse shuffle+sort; every later pull level / later BFS call on
    # the same graph reuses the cached layout — without this the
    # 2|E|-row rebuild inside the traversal erases the pull win
    # (measured: 0.77x vs push at 265M edges when rebuilt per call)

    state = spark.createDataFrame(
        [(int(source), 0, None)], schema="v long, depth long, pred long"
    )
    if not mark_predecessors:
        state = state.select("v", "depth")
    state = state.localCheckpoint(eager=True)

    def step(cur: DataFrame, i: int):
        unvisited_est = (n_vertices - sizes["visited"]) if direction_optimized else 0
        use_pull = (
            direction_optimized
            and sizes["frontier"] > pull_alpha * unvisited_est
        )
        if use_pull:
            unvisited = graph.vertices.join(cur, "v", "left_anti")
            if unvisited_est <= broadcast_threshold:
                unvisited = F.broadcast(unvisited)
            rev = graph.reversed_layout().edges
            cand = unvisited.join(rev, unvisited["v"] == rev["src"]).select(
                unvisited["v"].alias("nv"), rev["dst"].alias("nbr")
            )
            frontier = cur.where(F.col("depth") == i).select(F.col("v").alias("fv"))
            new = (
                cand.join(frontier, cand["nbr"] == frontier["fv"])
                .groupBy("nv")
                .agg(F.min("nbr").alias("npred"))
                .select(
                    F.col("nv").alias("v"),
                    F.lit(i + 1).cast("long").alias("depth"),
                    F.col("npred").alias("pred"),
                )
            )
        else:
            frontier = cur.where(F.col("depth") == i).select("v")
            if sizes["frontier"] <= broadcast_threshold:
                frontier = F.broadcast(frontier)
            cand = (
                frontier.join(edges, frontier["v"] == edges["src"])
                .groupBy(edges["dst"].alias("nv"))
                .agg(F.min(edges["src"]).alias("npred"))
            )
            new = cand.join(cur, cand["nv"] == cur["v"], "left_anti").select(
                F.col("nv").alias("v"),
                F.lit(i + 1).cast("long").alias("depth"),
                F.col("npred").alias("pred"),
            )
        if not mark_predecessors:
            new = new.select("v", "depth")
        out = cur.unionByName(new)

        def metrics(materialized: DataFrame) -> dict:
            n = materialized.where(F.col("depth") == i + 1).count()
            sizes["frontier"] = n  # feeds the next push/pull choice
            sizes["visited"] += n
            return {
                "frontier": n,
                "edges_traversed": n,
                "regime": "pull" if use_pull else "push",
            }

        return out, metrics

    return iterate(
        state, step, stop=lambda m: m["frontier"] == 0, max_iter=max_depth
    )
