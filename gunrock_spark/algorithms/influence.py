"""Independent-cascade influence spread over the live-edge subgraph.

The reference has no influence primitive (its traversal apps stop at
BFS/SSSP depth semantics, gunrock/app/bfs/bfs_enactor.cuh); this is
the Independent Cascade model of Kempe-Kleinberg-Tardos ("Maximizing
the spread of influence through a social network", KDD 2003) in its
live-edge / triggering-set formulation: flip ONE coin per edge —
(u, v) is "live" with probability p — and the influence spread of a
seed set S is exactly the set of vertices reachable from S through
live edges, with activation round = live-edge BFS depth from S.
Sampling the coin per EDGE (not per traversal attempt) is what makes
the two formulations equivalent (KKT Claim 2.3), and a deterministic
hash coin makes the whole cascade replayable in any engine — the
same seeded-reproducibility contract as the engine's walks and
samplers (functions/hashing.py h60).

Spark mapping: one Catalyst filter over the edge table (the h60 coin
— JVM-side, scan-bound, no Python, no shuffle) followed by a
multi-source frontier loop of the engine's usual advance/filter
shape: frontier ⋈ live-edges advance, distinct-dedup, anti-join cull
against the activated set, stop on empty frontier (the reference's
zero queue_length rule, problem_base.cuh:413 analog).

Scale notes (100 TB link graph): the coin filter prunes ~(1-p) of
the edges BEFORE any traversal state exists and pushes to the scan;
each round shuffles only frontier-out-edge rows joined against the
cached forward layout; the activated set is the only persisted state
(|V|-bounded rows), checkpointed per round to cut lineage like every
other frontier loop in the engine.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult
from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable

IC_COIN_MOD = 1000


def live_edges(
    graph: EdgeTable, p_milli: int = 300, seed: str = "ic"
) -> DataFrame:
    """The deterministic live-edge subgraph: edge (src, dst) survives
    iff h60('{seed}:src:dst') mod 1000 < p_milli — the per-edge coin
    of the IC triggering-set view, expressed as a pure Catalyst
    predicate so it rides the edge scan."""
    if not 0 <= p_milli <= IC_COIN_MOD:
        raise ValueError("p_milli must be in [0, 1000]")
    coin = F.pmod(
        h60(
            F.concat_ws(
                ":",
                F.lit(seed),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        ),
        F.lit(IC_COIN_MOD),
    )
    return graph.edges.where(coin < F.lit(p_milli))


def percolation_curve(
    graph: EdgeTable,
    p_millis: tuple[int, ...] = (100, 300, 600, 900),
    seed: str = "ic",
) -> DataFrame:
    """DataFrame[p_milli int, n_live_edges long, giant_size long]:
    the bond-percolation robustness curve of the link graph — for
    each retention probability p, keep each edge with the
    deterministic h60 coin and report the size of the largest weakly
    connected component of the surviving subgraph (the classic
    web-graph resilience analysis of Albert-Jeong-Barabási, "Error
    and attack tolerance of complex networks", Nature 2000 — random
    failure = random bond removal; nested coins make the curve
    monotone in p by construction).

    One hash-min CC run per sampled p over the coin-filtered edge
    table (the filter rides the scan; the CC loop is the engine's
    usual |E_live| join + partial-min shuffle) — the curve costs
    len(p_millis) CC runs, never a per-edge simulation."""
    spark = graph.edges.sparkSession
    from gunrock_spark.algorithms.components import connected_components

    rows = []
    for p in p_millis:
        live = live_edges(graph, p_milli=p, seed=seed)
        n_live = live.count()
        if n_live == 0:
            rows.append((int(p), 0, 0))
            continue
        sub = EdgeTable.from_df(live)
        labels = connected_components(sub).state
        giant = (
            labels.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("g"))
            .collect()[0]["g"]
        )
        rows.append((int(p), int(n_live), int(giant)))
    return spark.createDataFrame(
        rows, schema="p_milli int, n_live_edges long, giant_size long"
    )


def attack_curve(
    graph: EdgeTable, ks: tuple[int, ...] = (0, 8, 32)
) -> DataFrame:
    """DataFrame[k int, n_live_edges long, giant_size long]: the
    targeted-attack half of the Albert-Jeong-Barabási robustness
    analysis — for each k, delete the k highest-degree vertices
    (undirected degree, ties by smallest v) and report the largest
    weakly connected component of what remains. Scale-free graphs are
    resilient to the random-failure curve (:func:`percolation_curve`)
    but fragile here — the pair of curves is the standard resilience
    readout for a web crawl.

    Per sampled k: the hub set is one TakeOrdered over the |V|-row
    degree table (bounded by k, broadcast into two anti-joins that
    ride the edge scan), then one CC run over the surviving edges."""
    spark = graph.edges.sparkSession
    from gunrock_spark.algorithms.components import connected_components

    sym = graph.symmetrized().edges
    degs = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    rows = []
    for k in ks:
        if k > 0:
            hubs = F.broadcast(
                degs.orderBy(F.col("d").desc(), F.col("v").asc())
                .limit(int(k))
                .select("v")
            )
            live = (
                graph.edges.join(hubs, graph.edges["src"] == hubs["v"], "left_anti")
                .join(hubs, F.col("dst") == hubs["v"], "left_anti")
            )
        else:
            live = graph.edges
        n_live = live.count()
        if n_live == 0:
            rows.append((int(k), 0, 0))
            continue
        labels = connected_components(EdgeTable.from_df(live)).state
        giant = (
            labels.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("g"))
            .collect()[0]["g"]
        )
        rows.append((int(k), int(n_live), int(giant)))
    return spark.createDataFrame(
        rows, schema="k int, n_live_edges long, giant_size long"
    )


def degree_discount_seeds(
    graph: EdgeTable, k: int = 4, p_milli: int = 300
) -> DataFrame:
    """DataFrame[rank int, seed long]: influence-maximization seed
    selection by DegreeDiscount (Chen-Wang-Yang, "Efficient influence
    maximization in social networks", KDD 2009 Alg. 4) — the
    practical near-greedy heuristic: pick the vertex with the highest
    DISCOUNTED degree, discounting each vertex by its already-selected
    neighbors t_v (they no longer need to be reached through v):

        ddv = d_v - 2·t_v - (d_v - t_v)·t_v·p

    over the undirected (symmetrized, deduped) view. Determinism
    contract: the score is kept in exact integer arithmetic — scaled
    by 1000, score = 1000·(d - 2t) - (d - t)·t·p_milli — argmax ties
    broken by smallest v, so every round is SQL-replayable with no
    float comparisons.

    Scale shape: k rounds, each ONE |V|-row arg-max (TakeOrdered —
    per-partition top-1, no global sort) plus a broadcast semi-join
    update touching only the chosen seed's neighbor rows; state is
    the |V|-row (v, d, t) table, checkpointed per round."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = graph.edges.sparkSession
    sym = graph.symmetrized().edges
    state = (
        sym.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("d"))
        .select("v", "d", F.lit(0).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    score = (
        F.lit(1000) * (F.col("d") - 2 * F.col("t"))
        - (F.col("d") - F.col("t")) * F.col("t") * F.lit(p_milli)
    )
    seeds: list[tuple[int, int]] = []
    for i in range(1, k + 1):
        top = (
            state.orderBy(score.desc(), F.col("v").asc()).limit(1).collect()
        )
        if not top:
            break
        s = int(top[0]["v"])
        seeds.append((i, s))
        nbrs = sym.where(F.col("src") == s).select(F.col("dst").alias("_n"))
        state = (
            state.where(F.col("v") != s)
            .join(F.broadcast(nbrs), state["v"] == F.col("_n"), "left")
            .select(
                "v",
                "d",
                (
                    F.col("t")
                    + F.when(F.col("_n").isNotNull(), 1).otherwise(0)
                ).cast("long").alias("t"),
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(seeds, schema="rank int, seed long")


def ic_spread(
    graph: EdgeTable,
    seeds: DataFrame,
    p_milli: int = 300,
    max_rounds: int = 30,
    seed: str = "ic",
) -> IterationResult:
    """Influence spread of ``seeds`` (DataFrame[source long], e.g.
    bc.sample_sources) under IC with edge probability p_milli/1000.

    Result state: (v long, round int) — activated vertices only;
    seeds activate at round 0. Metrics per round record the newly
    activated count (the frontier size the reference's enactor logs
    as queue_length)."""
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    t0 = time.monotonic()
    live = live_edges(graph, p_milli=p_milli, seed=seed)

    state = (
        seeds.select(
            F.col("source").cast("long").alias("v"),
            F.lit(0).cast("int").alias("round"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = state.select("v")
    metrics: list[dict] = [{"iteration": 0, "activated": state.count()}]
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        nxt = (
            frontier.join(live, frontier["v"] == live["src"])
            .select(live["dst"].alias("v"))
            .distinct()
        )
        new = (
            nxt.join(state, "v", "left_anti")
            .select("v", F.lit(r).cast("int").alias("round"))
            .localCheckpoint(eager=True)
        )
        n_new = new.count()
        if n_new == 0:
            converged = True
            break
        rounds = r
        metrics.append({"iteration": r, "activated": n_new})
        state = state.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("v")
    return IterationResult(
        state=state,
        iterations=rounds,
        converged=converged,
        metrics=metrics,
        elapsed_sec=time.monotonic() - t0,
    )
