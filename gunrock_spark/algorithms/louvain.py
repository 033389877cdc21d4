"""Louvain-style community detection — parallel modularity-gain
moves (the "Louvain phase 1" of Blondel et al. 2008, scheduled for
deterministic distributed execution).

Two mover schedules (``gate``): the default ``"color"`` moves one
Jones-Plassmann color class per round — adjacent vertices never move
simultaneously, so every move strictly increases modularity and the
ascent CONVERGES (the coloring-based schedule of the parallel-Louvain
literature, e.g. Grappolo); ``"all"`` is the fully synchronous
variant — every vertex every round — which is what the DuckDB oracle
unrolls (it can oscillate on bipartite-ish link graphs and is bounded
by ``max_iter``).

Every vertex starts in its own community. A moving vertex evaluates,
for each community c present in its neighborhood (plus its own), the
standard modularity gain comparator

    score(v -> c) = k_{v,c} - k_v * (tot(c) - [c = c(v)] * k_v) / 2m

where k_{v,c} = edge weight from v into c, k_v = v's undirected
(weighted) degree — on an ``EdgeTable`` built with ``weight=`` the
comparator runs on edge weights, e.g. the host-graph link counts —
tot(c) = sum of degrees in c, and the [.] term removes v's own
contribution when scoring its current community (standard ΔQ up to
the constant 1/m factor). The vertex adopts the argmax; ties break to
the SMALLEST community id, so the dynamics are fully deterministic
and SQL-replayable round by round. (With integer-valued weights the
weighted comparator is exactly reproducible too; with arbitrary float
weights the partial-sum order can perturb exact ties by an ulp —
the standard caveat for any float-weighted reduction.) A fixed ``max_iter`` bounds the
synchronous oscillation risk (same contract as mode-label
propagation); the loop stops early when no vertex moves.

Plan per round (all partial-aggregable, no windows, no Python):
  tot:   groupBy(c).sum(k_v)                    — |C| rows, shrinking
  k_vc:  state ⋈ sym-edges -> groupBy(v, c)     — the |E| advance
  cand:  union own-community zero row -> groupBy(v, c)
  pick:  ⋈ state ⋈ tot -> groupBy(v).max_by(c, (score, -c))
The tot join is keyed by candidate community; as communities coalesce
that key skews — at cluster scale AQE skew-join splits it (same
hot-key story as the PR hub tier, engine/skew.py). Degrees are
cast to double BEFORE the k_v * tot product so the comparator never
overflows at 10^12-scale degree sums.

Reference analog: the reference has no Louvain app; this extends the
community family (label_propagation.py, modularity.py) the same way
k-truss extends triangles. Modularity of the result is scored by
algorithms/modularity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def louvain(
    graph: EdgeTable,
    max_iter: int = 10,
    gate: str = "color",
) -> IterationResult:
    """Louvain phase-1 moves over the undirected view.

    ``gate`` picks the mover schedule:

    * ``"color"`` (default) — vertices move one Jones-Plassmann color
      class per round, so adjacent vertices never move simultaneously:
      every move strictly improves modularity, the ascent is monotone
      and the dynamics CONVERGE (no synchronous swap cycles).
      ``max_iter`` counts full sweeps (n_colors rounds each);
      convergence = a whole sweep with zero moves.
    * ``"all"`` — fully synchronous (every vertex every round), the
      SQL-replayable variant the driver oracle unrolls. Can oscillate
      on bipartite-ish link graphs; ``max_iter`` rounds bound it.

    Result state: DataFrame[v long, c long, kv long, prev long] —
    ``c`` is the community after the final round.
    """
    if gate not in ("color", "all"):
        raise ValueError(f"unknown gate {gate!r}")
    spark = graph.edges.sparkSession
    sym = graph.symmetrized()
    edges = sym.edges
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    # 2m = total directed weight of the symmetrized view — one action
    if graph.weighted:
        two_m = float(
            edges.agg(F.sum("weight").alias("s")).collect()[0]["s"]
        )
        kv = edges.groupBy(F.col("src").alias("v")).agg(
            F.sum("weight").alias("kv")
        )
    else:
        two_m = float(sym.num_edges())
        kv = edges.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("kv")
        )
    state = kv.select("v", F.col("v").alias("c"), "kv")

    n_colors = 1
    if gate == "color":
        from gunrock_spark.algorithms.coloring import greedy_coloring

        colors = greedy_coloring(graph).state
        n_colors = colors.agg(F.max("color")).collect()[0][0] + 1
        state = state.join(colors, "v")

    state = state.repartition(
        spark.sparkContext.defaultParallelism, "v"
    ).localCheckpoint(eager=True)

    def step(cur: DataFrame, i: int):
        cols = ["v", "c", "kv"] + (["color"] if gate == "color" else [])
        cur = cur.select(*cols)
        tot = cur.groupBy("c").agg(F.sum("kv").alias("tot")).withColumnRenamed(
            "c", "nc"
        )
        nbrc = edges.join(
            cur.select(F.col("v").alias("src"), F.col("c").alias("nc")), "src"
        ).select(F.col("dst").alias("v"), "nc", w.alias("w"))
        kvc = (
            nbrc.groupBy("v", "nc").agg(F.sum("w").alias("kvc"))
            if graph.weighted
            else nbrc.groupBy("v", "nc").agg(
                F.count(F.lit(1)).cast("long").alias("kvc")
            )
        )
        own = cur.select(
            "v",
            F.col("c").alias("nc"),
            (F.lit(0.0) if graph.weighted else F.lit(0).cast("long")).alias("kvc"),
        )
        cand = (
            kvc.unionByName(own).groupBy("v", "nc").agg(F.sum("kvc").alias("kvc"))
        )
        if gate == "color":
            # score only this round's movers — n_colors× less join volume
            cand = cand.join(
                cur.where(F.col("color") == F.lit(i % n_colors)).select("v"),
                "v",
                "left_semi",
            )
        scored = (
            cand.join(cur, "v")
            .join(tot, "nc")
            .withColumn(
                "score",
                F.col("kvc").cast("double")
                - (
                    F.col("kv").cast("double")
                    * (
                        F.col("tot")
                        - F.when(F.col("nc") == F.col("c"), F.col("kv")).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                )
                / F.lit(two_m),
            )
        )
        pick = scored.groupBy("v").agg(
            F.max_by(
                "nc", F.struct(F.col("score"), F.negative(F.col("nc")))
            ).alias("new_c")
        )
        prev = cur.withColumnRenamed("c", "prev")
        if gate == "color":
            # only this round's color class adopts its pick; the rest
            # keep their community (their pick rows are discarded)
            mover = F.col("color") == F.lit(i % n_colors)
            new = prev.join(pick, "v", "left").select(
                "v",
                F.when(mover, F.coalesce("new_c", F.col("prev")))
                .otherwise(F.col("prev"))
                .alias("c"),
                "kv",
                "prev",
                "color",
            )
        else:
            new = prev.join(pick, "v").select(
                "v", F.col("new_c").alias("c"), "kv", "prev"
            )

        def metrics(materialized: DataFrame) -> dict:
            changed = materialized.where(F.col("c") != F.col("prev")).count()
            return {"changed": changed, "edges_traversed": graph.num_edges()}

        return new, metrics

    if gate == "color":
        # converged = one full sweep (every color class) with no moves
        quiet = {"n": 0}

        def stop(m: dict) -> bool:
            quiet["n"] = quiet["n"] + 1 if m["changed"] == 0 else 0
            return quiet["n"] >= n_colors

        return iterate(state, step, stop=stop, max_iter=max_iter * n_colors)
    return iterate(state, step, stop=lambda m: m["changed"] == 0, max_iter=max_iter)


def louvain_communities(
    graph: EdgeTable, max_iter: int = 10, gate: str = "color"
) -> DataFrame:
    """DataFrame[v, community] after the final round."""
    return louvain(graph, max_iter=max_iter, gate=gate).state.select(
        "v", F.col("c").alias("community")
    )
