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
            alive = materialized.count()
            # unpersist only AFTER the state materialization: the new
            # state's plan references the frontier (through dec), so
            # dropping the cache first would recompute the frontier
            # filter+join inside materialized.count().
            frontier.unpersist()
            return {
                "changed": removed,
                "alive": alive,
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


def onion_decomposition(
    graph: EdgeTable,
    max_iter: int = 100_000,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 25,
    resume: bool = False,
) -> IterationResult:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016,
    "Multi-scale structure and topological anomaly detection via a new
    network statistic: the onion decomposition"): every vertex gets a
    ``layer`` (the peel round in which it was removed, 1-based) and a
    ``core`` (the k-core threshold in force at removal — exactly the
    vertex's core number, so this is also the classic synchronous
    peeling coreness algorithm; the h-index fixpoint in
    :func:`core_numbers` computes the same ``core`` column by a
    different route, and the two are cross-checked in tests).

    One peel round: with threshold k = max(previous k, minimum alive
    degree), remove EVERY alive vertex with deg <= k, label it with
    (round, k), and decrement its alive neighbors' degrees.

    Scale design (same family as :func:`k_core` delta peeling):
    - state is the |V|-row (v, deg, layer, core) table, hash-
      partitioned on v; removed rows stay in place with their labels,
      so no growing union of per-round outputs.
    - each round joins only the REMOVED frontier against the edge
      table, so total join work across the whole run is one pass over
      E (each edge participates exactly once per removed endpoint).
    - the only driver-side values are two scalars folded into the
      shared per-round metrics action (alive count + min alive
      degree); no per-vertex driver loop.
    - round count = number of onion layers (O(sqrt(|E|)) worst case;
      measured 510 on an rmat20/ef8 graph, max core 291) — the same
      round-count class as the reference's k-core-style peel loops
      (gunrock/app/cc/cc_enactor.cuh lifecycle). The layer count is a
      graph-intrinsic depth the synchronous peel cannot compress, so
      each round is kept to exactly ONE Spark action; when only the
      CORE column is needed, prefer :func:`core_numbers` — the
      h-index fixpoint converges in ~10-20 rounds regardless of
      onion depth.
    """
    from gunrock_spark.engine.checkpoint import CheckpointManager

    spark = graph.edges.sparkSession
    sym = graph.symmetrized().edges
    state = (
        _sym_degrees(graph)
        .select(
            "v",
            "deg",
            F.lit(None).cast("int").alias("layer"),
            F.lit(None).cast("long").alias("core"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )
    checkpointer = None
    start_iter, prior_metrics = 0, None
    if checkpoint_dir is not None:
        checkpointer = CheckpointManager(
            checkpoint_dir,
            config={"algorithm": "onion", "m": graph.num_edges()},
        )
        if resume:
            loaded = checkpointer.load_latest(spark)
            if loaded is not None:
                state, start_iter, prior_metrics = loaded
    # the three driver scalars are all derivable from the state (k is
    # the max core assigned so far — every round assigns its threshold
    # to >= 1 vertex, and the threshold is nondecreasing), so a fresh
    # start and a resume share ONE init aggregate.
    alive0 = F.col("layer").isNull()
    first = state.agg(
        F.min(F.when(alive0, F.col("deg"))).alias("md"),
        F.count(F.when(alive0, F.lit(1))).alias("alive"),
        F.max("core").alias("k"),
    ).first()
    cell = {
        "k": int(first["k"] or 0),
        "mindeg": int(first["md"] or 0),
        "alive": int(first["alive"]),
    }

    def peel_step(cur: DataFrame, i: int):
        k = max(cell["k"], cell["mindeg"])
        cell["k"] = k
        alive = F.col("layer").isNull()
        removed_now = alive & (F.col("deg") <= F.lit(k))
        frontier = cur.where(removed_now).select("v")
        dec = (
            frontier.join(sym, frontier["v"] == sym["src"])
            .groupBy(sym["dst"].alias("dv"))
            .agg(F.count(F.lit(1)).alias("ddec"))
        )
        new = cur.join(dec, cur["v"] == dec["dv"], "left").select(
            cur["v"],
            # removed rows (this round or earlier) freeze their degree;
            # alive rows lose one per removed neighbor
            F.when(
                removed_now | ~alive, F.col("deg")
            ).otherwise(F.col("deg") - F.coalesce("ddec", F.lit(0))).alias("deg"),
            F.when(removed_now, F.lit(i + 1).cast("int"))
            .otherwise(F.col("layer"))
            .alias("layer"),
            F.when(removed_now, F.lit(k).cast("long"))
            .otherwise(F.col("core"))
            .alias("core"),
        )

        def metrics(materialized: DataFrame) -> dict:
            # ONE action per round: the removed count is the previous
            # alive count minus the new one (the frontier is exactly
            # the rows whose layer got set), so no second job and no
            # frontier persist. Round count = onion depth, so the
            # per-round action count is the latency driver at scale.
            row = materialized.where(F.col("layer").isNull()).agg(
                F.count(F.lit(1)).alias("alive"), F.min("deg").alias("md")
            ).first()
            now_alive = int(row["alive"])
            removed = cell["alive"] - now_alive
            cell["alive"] = now_alive
            cell["mindeg"] = int(row["md"] or 0)
            return {
                "changed": removed,
                "alive": now_alive,
                "threshold": k,
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    return iterate(
        state,
        peel_step,
        stop=lambda m: m["alive"] == 0,
        max_iter=max_iter,
        checkpointer=checkpointer,
        checkpoint_interval=checkpoint_interval,
        start_iteration=start_iter,
        prior_metrics=prior_metrics,
    )


def onion_layers(graph: EdgeTable, max_iter: int = 100_000) -> DataFrame:
    """(v, layer, core) — see :func:`onion_decomposition`."""
    return onion_decomposition(graph, max_iter=max_iter).state.select(
        "v", "layer", "core"
    )


def h_index_round(cur: DataFrame, sym: DataFrame) -> DataFrame:
    """One synchronous H-operator round: cur (v, c, ...) -> (v, c, prev)
    with c = h-index of the neighbor c-multiset. Hub-safe shape — see
    :func:`core_numbers` docstring for the capped-distinct-value
    identity; the only ordered pass is the cumulative count over the
    per-vertex distinct capped values (plan-gated in
    tests/test_plans.py::test_coreness_round_window_over_aggregated_rows).
    """
    # gather neighbor values, capped at the receiving vertex's own
    # current value (join the owner's c back on dst) — the cap is
    # what lets groupBy(v, capped) collapse a hub's 10^7 gathered
    # rows into <= c(v)+1 aggregate rows before anything sorts.
    gathered = (
        cur.select(F.col("v").alias("u"), F.col("c").alias("cu"))
        .join(sym, F.col("u") == sym["src"])
        .select(sym["dst"].alias("v"), "cu")
        .alias("g")
    )
    own = cur.select(F.col("v").alias("ov"), F.col("c").alias("cv")).alias("o")
    nbr = gathered.join(own, F.col("g.v") == F.col("o.ov")).select(
        F.col("g.v").alias("v"), F.least("g.cu", "o.cv").alias("capped")
    )
    # partial-agg shape: map-side combine absorbs dst skew here
    counts = nbr.groupBy("v", "capped").agg(F.count(F.lit(1)).alias("n"))
    # cumulative count over the per-vertex DISTINCT-value rows
    # (bounded by min(#distinct values, c(v)+1), never the degree)
    w = (
        Window.partitionBy("v")
        .orderBy(F.col("capped").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = (
        counts.withColumn("cnt_ge", F.sum("n").over(w))
        .groupBy("v")
        .agg(F.max(F.least(F.col("capped"), F.col("cnt_ge"))).alias("h"))
    )
    return (
        cur.select("v", F.col("c").alias("prev"))
        .join(h, "v", "left")
        .select("v", F.coalesce("h", F.lit(0)).cast("long").alias("c"), "prev")
    )


def core_numbers(graph: EdgeTable, max_iter: int = 100) -> IterationResult:
    """Per-vertex coreness via the h-index fixpoint. State: (v, c,
    prev); converged c(v) = core number of v (the largest k such that
    v belongs to the k-core).

    Update rule (applied synchronously each round):
        c_{t+1}(v) = H({c_t(u) : u ~ v})
    where H is the h-index of the neighbor multiset — the largest h
    such that at least h neighbors have value >= h. With c_0 = degree
    the sequence is pointwise non-increasing and converges to the
    coreness (Lü et al. 2016).

    Hub-safe H (no per-vertex sort over the |E|-row gather): neighbor
    values are first CAPPED at the owner's current value c(v) (valid
    because the h-index of the multiset never exceeds c(v) while the
    sequence is non-increasing, and capping values above any candidate
    h cannot change whether cnt(>=h) >= h for h <= c(v)), then reduced
    by a map-side-combinable groupBy(v, capped) count. H is recovered
    from the DISTINCT-value table via the identity
        H = max over distinct capped values d of min(d, cnt(>= d))
    (every candidate min(d, cnt(>=d)) is a valid h — the cnt(>=d)
    neighbors all have value >= d >= min(...) — and taking d = the
    smallest value among the h* witnesses achieves the maximum h*).
    The only ordered pass is the cumulative count over that distinct
    table: a 10^7-in-degree hub's window input shrinks from 10^7
    gathered rows (r3 shape) to at most min(#distinct neighbor
    values, c(v)+1) rows — after round 1 the values collapse toward
    the (small) coreness range, and the |E|-row stage is pure
    partial aggregation.
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
        new = h_index_round(cur, sym)

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
