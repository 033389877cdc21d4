"""k-truss decomposition — iterative triangle-support peeling.

The k-truss is the maximal subgraph in which every edge participates
in at least k-2 triangles (support >= k-2). It is the edge-analog of
k-core (algorithms/kcore.py) and the standard web/social-graph
cohesion primitive one step above triangle counting; the reference
covers the ingredient kernels (triangle enumeration via its
intersection operator, gunrock/oprtr/intersection — same kernel our
triangles.py maps to Spark) and the synchronous peel loop follows the
same delta-peeling pattern as k-core
(gunrock/app/cc/cc_functor.cuh-style hooking is the CC cousin).

Per round, over the CURRENT surviving undirected edge set:

1. orient edges low-rank -> high-rank by (current degree, id) — the
   same orientation trick as triangles.py:_oriented, which bounds
   per-pivot wedge fan-out by O(sqrt(m)) on power-law graphs;
2. enumerate each triangle exactly once (wedge join + closing-edge
   join — Catalyst sort-merge joins, no UDF);
3. scatter each triangle to its 3 canonical edges (explode-free
   3-way union), partial-agg count = per-edge support;
4. keep edges with support >= k-2 (edges in no triangle have support
   0 and drop immediately).

The loop runs through engine/iterate.py, so it gets per-iteration
metrics, lineage cuts, and checkpoint/resume like every other
primitive. Each round is a triangle-counting job on a shrinking edge
set — the dominant cost is round 1, identical to triangle_count's
wedge path; the blocks kernel (csr_blocks) remains the scale path for
the enumeration if round-1 wedge volume is extreme (see triangles.py
auto-dispatch for the criterion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def _canonical_und(graph: EdgeTable) -> DataFrame:
    return (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_support(und: DataFrame) -> DataFrame:
    """DataFrame[a, b, support] over canonical edges (a < b), counting
    each triangle once via degree-rank orientation."""
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")), "a").join(
        deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")), "b"
    )
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    o = e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )
    e1 = o.select("u", F.col("w").alias("w1"))
    e2 = o.select("u", F.col("w").alias("w2"))
    wedges = e1.join(e2, "u").where(F.col("w1") < F.col("w2"))
    closing = o.select(F.least("u", "w").alias("w1"), F.greatest("u", "w").alias("w2"))
    tri = wedges.join(closing, ["w1", "w2"]).select("u", "w1", "w2")
    pairs = (
        tri.select(F.least("u", "w1").alias("a"), F.greatest("u", "w1").alias("b"))
        .unionByName(tri.select(F.least("u", "w2").alias("a"), F.greatest("u", "w2").alias("b")))
        .unionByName(tri.select(F.col("w1").alias("a"), F.col("w2").alias("b")))
    )
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def k_truss(graph: EdgeTable, k: int, max_iter: int = 50, **engine_kw) -> IterationResult:
    """Peel to the k-truss; ``result.state`` is DataFrame[a, b] — the
    canonical undirected edges of the k-truss (empty if none)."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    spark = graph.edges.sparkSession
    state = (
        _canonical_und(graph)
        .repartition(spark.sparkContext.defaultParallelism, "a")
        .localCheckpoint(eager=True)
    )
    return _peel_to_fixpoint(state, k - 2, max_iter, **engine_kw)


def _peel_to_fixpoint(
    state: DataFrame, thresh: int, max_iter: int = 50, **engine_kw
) -> IterationResult:
    """Support-peel ``state`` (canonical a<b edges, already
    materialized) until no edge drops; the shared loop behind
    :func:`k_truss` and :func:`trussness`."""

    def step(cur: DataFrame, i: int):
        sup = _edge_support(cur)
        new = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce("support", F.lit(0)) >= thresh)
            .select("a", "b")
        )

        def metrics(materialized: DataFrame) -> dict:
            remaining = materialized.count()
            before = cur.count()  # cached/checkpointed — cheap count
            return {"removed": before - remaining, "remaining": remaining}

        return new, metrics

    return iterate(
        state,
        step,
        stop=lambda m: m["removed"] == 0 or m["remaining"] == 0,
        max_iter=max_iter,
        **engine_kw,
    )


def trussness(
    graph: EdgeTable, k_cap: int = 6, max_iter: int = 50, **engine_kw
) -> DataFrame:
    """DataFrame[a, b, trussness int]: the full truss decomposition —
    for every canonical undirected edge, the largest k such that the
    edge survives in the k-truss (2 for triangle-free edges), the
    edge analog of core_numbers' coreness.

    Computed by NESTED peeling: the (k+1)-truss is a subgraph of the
    k-truss, so level k+1 peels FROM level k's survivors — total work
    is a telescoping sum over shrinking edge sets, with level 3 (one
    full k_truss run) dominating. Labels are assembled with one
    union + partial-max aggregation over the survivor sets (at most
    |E_3| + |E_4| + ... rows), never a per-level join chain.

    ``k_cap`` bounds the level loop (the loop also stops at the first
    EMPTY truss): reported values are min(true trussness, k_cap) —
    the standard web-scale contract, since trussness above a small
    constant only distinguishes ever-denser cores that a crawl
    pipeline treats identically. At 100 TB each level is a
    triangle-support job on a rapidly shrinking edge set; the level-3
    enumeration is the same cost class as triangle counting (see
    triangles.py auto-dispatch for the extreme-wedge-volume escape).
    """
    if k_cap < 3:
        raise ValueError("k_cap must be >= 3")
    spark = graph.edges.sparkSession
    und = (
        _canonical_und(graph)
        .repartition(spark.sparkContext.defaultParallelism, "a")
        .localCheckpoint(eager=True)
    )
    levels: list[DataFrame] = []
    cur = und
    k = 3
    while k <= k_cap:
        surv = _peel_to_fixpoint(cur, k - 2, max_iter, **engine_kw).state
        if surv.isEmpty():
            break
        levels.append(surv.select("a", "b", F.lit(k).alias("k")))
        cur = surv
        k += 1
    if not levels:
        return und.select("a", "b", F.lit(2).cast("int").alias("trussness"))
    lab = levels[0]
    for lv in levels[1:]:
        lab = lab.unionByName(lv)
    lab = lab.groupBy("a", "b").agg(F.max("k").alias("k"))
    return und.join(lab, ["a", "b"], "left").select(
        "a", "b", F.coalesce("k", F.lit(2)).cast("int").alias("trussness")
    )
