"""PageRank — synchronous push PR matching the reference semantics.

Re-creates (from scratch, DataFrame-first) the math of the reference's
normalized PageRank:
  - init rank = 1/n (normalized) or 1.0 (scaled)
    (gunrock/app/pr/pr_problem.cuh:397-423)
  - per iteration over ALL vertices (pr_enactor.cuh:475,504-533):
      new(v) = reset + delta * sum_{u->v} rank(u)/out_degree(u)
    with reset = (1-delta)/n normalized, (1-delta) scaled
    (pr_functor.cuh:209-226); 0-out-degree vertices contribute nothing
    (tests/pr/test_pr.cu:404-408) unless ``compensate``.
  - per-vertex convergence: vertex still active iff
    |new - old| > threshold * old (pr_functor.cuh:225); the run stops
    when NO vertex is active (Stop_Condition, pr_enactor.cuh:846-876)
    or iteration count exceeds max_iter.
  - ``compensate`` (dangling handling, tests/pr/test_pr.cu:566-618):
    add virtual sink vertex n; every 0-out-degree vertex gets one edge
    -> sink, sink gets an edge -> every original vertex; n becomes n+1.
    Implemented here WITHOUT materializing the |V| sink edges: the sink
    is one extra state row, danglers route their whole rank to it, and
    its uniform contribution is a broadcast scalar column.

Spark plan per iteration (SURVEY.md §2.2 PR row):
  state(v, out_degree, rank)  ⋈  edges on v = src     [shuffle or
      broadcast join — AQE decides; edges pre-partitioned by src]
  -> select(dst, rank/out_degree)
  -> groupBy(dst).sum          [map-side partial agg absorbs power-law
      dst skew; AQE skew handling for the join side]
  -> state left-join sums on v = dst -> new rank + per-vertex delta.
Each iteration is localCheckpointed (lineage cut) and optionally
snapshotted for resume via CheckpointManager.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.checkpoint import CheckpointManager
from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable

SINK = -1  # virtual dangling sink vertex id (reference uses id n)


def pagerank(
    graph: EdgeTable,
    delta: float = 0.85,
    threshold: float = 0.01,
    max_iter: int = 50,
    normalized: bool = True,
    compensate: bool = False,
    src: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> IterationResult:
    """Run PageRank to convergence. Result state schema:
    (v long, out_degree long, rank double, prev double); final ranked
    output via :func:`ranked` (rank desc, v asc — the reference's
    stable sort, tests/pr/test_pr.cu:455-456).

    The returned ``IterationResult.state`` EXCLUDES the virtual sink
    row when ``compensate`` is set (matching the reference, which
    reports n+1 nodes; we report the original vertices — callers
    wanting the sink use the raw loop).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges
    n_real = graph.num_vertices()

    if n_real == 0:
        from gunrock_spark.engine.iterate import IterationResult as _IR

        empty = spark.createDataFrame(
            [], schema="v long, out_degree long, rank double, prev double"
        )
        return _IR(state=empty, iterations=0, converged=True)

    has_dangling = compensate and graph.degrees.where(F.col("out_degree") == 0).limit(1).count() > 0
    n = n_real + 1 if has_dangling else n_real
    reset = (1.0 - delta) / n if normalized else (1.0 - delta)
    init = 1.0 / n if normalized else 1.0

    state = graph.degrees.select(
        "v", "out_degree", F.lit(float(init)).alias("rank")
    )
    if has_dangling:
        sink = spark.createDataFrame(
            [(SINK, n_real, float(init))], schema="v long, out_degree long, rank double"
        )
        state = state.unionByName(sink)
    state = state.repartition(spark.sparkContext.defaultParallelism, "v").localCheckpoint(eager=True)

    checkpointer = None
    start_iter, prior_metrics = 0, None
    if checkpoint_dir is not None:
        checkpointer = CheckpointManager(
            checkpoint_dir,
            # max_iter deliberately EXCLUDED: it's an operational
            # limit, not semantics — resuming a killed run with a
            # higher budget must be allowed (kill/extend workflow).
            config={
                "algorithm": "pagerank",
                "delta": delta,
                "threshold": threshold,
                "normalized": normalized,
                "compensate": compensate,
                "src": src,
                "n": n,
            },
        )
        if resume:
            loaded = checkpointer.load_latest(spark)
            if loaded is not None:
                state, start_iter, prior_metrics = loaded

    def step(cur: DataFrame, i: int):
        # Contributions along real edges: rank/out_degree pushed to dst.
        pushers = cur.where((F.col("out_degree") > 0) & (F.col("v") != SINK))
        contribs = (
            pushers.join(edges, pushers["v"] == edges["src"])
            .select(
                edges["dst"].alias("dst"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
        )
        if has_dangling:
            # danglers' single edge -> sink: whole rank to SINK
            dangle = cur.where((F.col("out_degree") == 0) & (F.col("v") != SINK)).select(
                F.lit(SINK).cast("long").alias("dst"), F.col("rank").alias("contrib")
            )
            # sink -> every original vertex: uniform rank/n_real, added
            # as a scalar column below (never materialized as edges)
            sink_contrib = cur.where(F.col("v") == SINK).select(
                (F.col("rank") / F.col("out_degree")).alias("sc")
            )
            contribs = contribs.unionByName(dangle)
        sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("msg"))
        new = (
            cur.select("v", "out_degree", F.col("rank").alias("prev"))
            .join(sums, F.col("v") == F.col("dst"), "left")
            .drop("dst")
        )
        if has_dangling:
            # broadcast the single sink row; sink itself receives no
            # uniform share (reference sink has no self-edge)
            new = new.crossJoin(F.broadcast(sink_contrib)).withColumn(
                "msg",
                F.coalesce("msg", F.lit(0.0))
                + F.when(F.col("v") != SINK, F.col("sc")).otherwise(F.lit(0.0)),
            ).drop("sc")
        # personalized mode (src set): the whole (1-delta) reset mass
        # lands on src — wtf_functor.cuh:119's
        # (1-delta) * [src_node == node || src_node == -1] term.
        reset_col = (
            F.lit(reset)
            if src is None
            else F.when(F.col("v") == src, F.lit(1.0 - delta)).otherwise(F.lit(0.0))
        )
        new = new.select(
            "v",
            "out_degree",
            (reset_col + F.lit(delta) * F.coalesce("msg", F.lit(0.0))).alias("rank"),
            "prev",
        )

        def metrics(materialized: DataFrame) -> dict:
            active = materialized.where(
                F.abs(F.col("rank") - F.col("prev")) > threshold * F.col("prev")
            ).count()
            return {"active": active, "edges_traversed": graph.num_edges()}

        return new, metrics

    result = iterate(
        state,
        step,
        stop=lambda m: m["active"] == 0,
        max_iter=max_iter,
        checkpointer=checkpointer,
        checkpoint_interval=checkpoint_interval,
        start_iteration=start_iter,
        prior_metrics=prior_metrics,
    )
    if has_dangling:
        result.state = result.state.where(F.col("v") != SINK)
    return result


def ranked(result_state: DataFrame, scaled_n: int | None = None) -> DataFrame:
    """(v, rank) sorted rank desc, v asc — the reference's stable-sorted
    extract (pr_enactor.cuh:1380-1401). ``scaled_n``: divide by n when
    the run used scaled (unnormalized) mode, matching test_pr.cu:461."""
    rank_col = F.col("rank") / scaled_n if scaled_n else F.col("rank")
    return result_state.select("v", rank_col.alias("rank")).orderBy(
        F.desc("rank"), F.asc("v")
    )
