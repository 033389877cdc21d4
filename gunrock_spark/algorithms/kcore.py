"""k-core decomposition — iterative peeling and h-index coreness.

The reference's app inventory stops at its ten primitives, but a
link-graph engine over a web crawl needs the standard density
filters: the k-core (drop pages with fewer than k surviving
neighbors — spam/boilerplate pruning before PageRank) and per-vertex
core numbers (the classic graph-mining density feature). Both are
frontier-style fixpoints, so they reuse the same iterate driver as
CC/PageRank (engine/iterate.py; the reference's per-primitive
convergence loop, e.g. gunrock/app/cc/cc_enactor.cuh lifecycle).

Scale design:
- ``k_core`` peels by DELTA: each round joins only the edges incident
  to the vertices REMOVED that round (not the whole edge table), so
  total join work across all rounds is bounded by one pass over E —
  the textbook distributed peeling formulation. State is the
  |V|-sized (v, deg) table; both shuffles hash-partition on v.
- ``core_numbers`` runs the h-index fixpoint (Lü-Chen-Zhang-Zhou-
  Stanley 2016, "Vital nodes identification in complex networks" /
  the H-operator convergence theorem): c_0 = degree, c_{t+1}(v) =
  H({c_t(u) : u ~ v}); the pointwise limit is exactly the coreness.
  Each round is one |E|-row join + one per-vertex order-statistic
  (window over the neighbor multiset — the per-vertex sort is
  bounded by degree, the same cost class as the adjacency sorts the
  CSR layout already pays). No driver-side loop over vertices; the
  only driver action per round is the shared stop-metric count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def _sym_degrees(graph: EdgeTable) -> DataFrame:
    """(v, deg) over the symmetrized (undirected, deduped) view."""
    sym = graph.symmetrized().edges
    return sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def k_core(
    graph: EdgeTable,
    k: int,
    max_iter: int = 100,
) -> IterationResult:
    """Vertices of the k-core (max induced subgraph with min degree
    >= k), with their induced-subgraph degree. State: (v, deg);
    converged state rows = the k-core.

    Delta peeling: a round removes every alive vertex with deg < k
    and decrements only its neighbors' degrees, so each edge is
    touched at most twice across the whole run (once per endpoint
    removal) — the reason this survives a 100x edge count where
    recompute-degrees-per-round would pay O(rounds * |E|).
    """
    spark = graph.edges.sparkSession
    sym = graph.symmetrized().edges
    state = _sym_degrees(graph).repartition(
        spark.sparkContext.defaultParallelism, "v"
    ).localCheckpoint(eager=True)

    # the frontier can be large in round 1 (every low-degree vertex) —
    # a plain hash join (not a broadcast) keeps the plan safe at scale.
    def peel_step(cur: DataFrame, i: int):
        frontier = cur.where(F.col("deg") < k).select("v").persist()
        dec = (
            frontier.join(sym, frontier["v"] == sym["src"])
            .groupBy(sym["dst"].alias("dv"))
            .agg(F.count(F.lit(1)).alias("ddec"))
        )
        survivors = cur.where(F.col("deg") >= k)
        new = (
            survivors.join(dec, survivors["v"] == dec["dv"], "left")
            .select(
                "v",
                (F.col("deg") - F.coalesce("ddec", F.lit(0))).alias("deg"),
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            removed = frontier.count()
            frontier.unpersist()
            return {
                "changed": removed,
                "alive": materialized.count(),
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    return iterate(
        state,
        peel_step,
        stop=lambda m: m["changed"] == 0,
        max_iter=max_iter,
    )


def k_core_vertices(graph: EdgeTable, k: int, max_iter: int = 100) -> DataFrame:
    """(v, deg) of the k-core — deg is the degree INSIDE the core."""
    return k_core(graph, k, max_iter=max_iter).state.select("v", "deg")


def core_numbers(graph: EdgeTable, max_iter: int = 100) -> IterationResult:
    """Per-vertex coreness via the h-index fixpoint. State: (v, c,
    prev); converged c(v) = core number of v (the largest k such that
    v belongs to the k-core).

    Update rule (applied synchronously each round):
        c_{t+1}(v) = H({c_t(u) : u ~ v})
    where H is the h-index of the neighbor multiset — the largest h
    such that at least h neighbors have value >= h. With c_0 = degree
    the sequence is pointwise non-increasing and converges to the
    coreness (Lü et al. 2016). Implemented as one |E|-row join
    (neighbor value gather) + a per-vertex rank window:
        H = max over neighbors of least(rank_in_desc_order, value).
    """
    spark = graph.edges.sparkSession
    sym = graph.symmetrized().edges
    state = (
        _sym_degrees(graph)
        .select("v", F.col("deg").alias("c"), F.col("deg").alias("prev"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        nbr = (
            cur.select(F.col("v").alias("u"), F.col("c").alias("cu"))
            .join(sym, F.col("u") == sym["src"])
            .select(sym["dst"].alias("v"), "cu")
        )
        w = Window.partitionBy("v").orderBy(F.col("cu").desc())
        h = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("v")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("cu"))).alias("h"))
        )
        new = (
            cur.select("v", F.col("c").alias("prev"))
            .join(h, "v", "left")
            .select("v", F.coalesce("h", F.lit(0)).cast("long").alias("c"), "prev")
        )

        def metrics(materialized: DataFrame) -> dict:
            changed = materialized.where(F.col("c") != F.col("prev")).count()
            return {"changed": changed, "edges_traversed": graph.num_edges()}

        return new, metrics

    return iterate(
        state,
        step,
        stop=lambda m: m["changed"] == 0,
        max_iter=max_iter,
    )
