"""Forward-push personalized PageRank + conductance sweep cut —
local graph clustering (Andersen, Chung, Lang, FOCS 2006; public
knowledge).

The PageRank family here (algorithms/pagerank.py) is the GLOBAL power
iteration: every round touches all |V| state rows and all |E| edges.
Forward push is the LOCAL dual: state is an approximation vector ``p``
and a residual vector ``r`` supported only near the seed, and a round
touches only the frontier — vertices whose residual exceeds
``eps * deg(v)`` — and their out-edges. Total pushed volume is bounded
by O(1/(alpha*eps)) regardless of graph size, which is what makes
"community around THIS page" queries answerable on a 10^12-page link
graph without a full PR run.

Synchronous batched variant (deterministic, engine-replayable —
the sequential queue of the paper and this batched form converge to
the same invariant; we pin THIS variant's exact trajectory in the
oracle)::

    p_0 = 0;  r_0 = 1/|S| on each seed in S
    round t:
      F_t = { v : r(v) > eps * max(deg(v), 1) }          (frontier)
      p'  = p + alpha * r              on F_t
      each out-edge (v, u), v in F_t:  u receives (1-alpha) * r(v)/deg(v)
      r'  = (v in F_t ? 0 : r(v)) + received mass
    stop when F_t is empty (or round cap).

Dangling frontier vertices (deg = 0) absorb ``alpha*r`` into p and
the rest of their residual leaves the system — the directed-web
convention (the global PR's ``compensate`` sink is a different,
explicit contract).

Spark plan per round (the advance + fused-reduce shape, reference
analog gunrock/oprtr/edge_map_forward/cta.cuh re-expressed per
SURVEY §4): frontier filter on the |support|-row state, one
frontier ⋈ edges equi-join on src, one map-side-combinable
groupBy(dst).sum, one |support|-row full-outer merge. No Python in
the loop; rows with p = r = 0 never exist (mass only ever arrives).

The sweep cut turns the PPR vector into a community: order candidate
vertices by p(v)/deg(v) descending, and for each prefix S_k report
conductance phi(S_k) = cut(S_k) / min(vol(S_k), vol(V)-vol(S_k)) over
the SYMMETRIZED graph. Everything after the bounded top-k selection
(TakeOrdered, no global sort) runs over <= k rows + one broadcast
semi-join of the edge table against the k-row prefix table, so the
sweep costs one edge scan regardless of k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def ppr_push(
    graph: EdgeTable,
    seeds: Sequence[int],
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_iter: int = 50,
) -> IterationResult:
    """Forward-push PPR from ``seeds``. Result state schema
    ``(v long, p double, r double)`` — only rows with mass (the
    support), never all |V|. ``p`` sums to <= 1; ``p + r`` accounts
    for all non-leaked mass. Deterministic: the synchronous frontier
    schedule above, float64 throughout."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    spark = graph.edges.sparkSession
    seed_df = spark.createDataFrame(
        [(int(s),) for s in dict.fromkeys(int(s) for s in seeds)], "v long"
    )
    n_seeds = seed_df.count()
    edges = graph.edges.select("src", "dst")
    deg = graph.degrees.select("v", F.col("out_degree").alias("d"))

    state0 = seed_df.select(
        "v", F.lit(0.0).alias("p"), F.lit(1.0 / n_seeds).alias("r")
    )

    def step(cur: DataFrame, i: int):
        s = cur.join(deg, "v", "left").select(
            "v",
            "p",
            "r",
            F.coalesce("d", F.lit(0)).alias("d"),
        )
        s = s.withColumn(
            "in_f", F.col("r") > eps * F.greatest(F.col("d"), F.lit(1))
        )
        pushed = (
            s.where(F.col("in_f") & (F.col("d") > 0))
            .join(edges, s["v"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum((1.0 - alpha) * F.col("r") / F.col("d")).alias("m"))
            .select(F.col("dst").alias("v"), "m")
        )
        merged = (
            s.select("v", "p", "r", "in_f")
            .join(pushed, "v", "full_outer")
            .select(
                "v",
                (
                    F.coalesce("p", F.lit(0.0))
                    + F.when(
                        F.coalesce("in_f", F.lit(False)),
                        alpha * F.col("r"),
                    ).otherwise(F.lit(0.0))
                ).alias("p"),
                (
                    F.when(
                        F.coalesce("in_f", F.lit(False)), F.lit(0.0)
                    ).otherwise(F.coalesce("r", F.lit(0.0)))
                    + F.coalesce("m", F.lit(0.0))
                ).alias("r"),
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            # one action over the materialized snapshot: next-round
            # frontier size + support size in a single agg.
            row = (
                materialized.join(deg, "v", "left")
                .agg(
                    F.sum(
                        F.when(
                            F.col("r")
                            > eps
                            * F.greatest(F.coalesce("d", F.lit(0)), F.lit(1)),
                            1,
                        ).otherwise(0)
                    ).alias("frontier"),
                    F.count(F.lit(1)).alias("rows"),
                )
                .collect()[0]
            )
            return {
                "frontier": int(row["frontier"] or 0),
                "rows": int(row["rows"]),
            }

        return merged, metrics

    res = iterate(
        state0,
        step,
        stop=lambda m: m.get("frontier", 1) == 0,
        max_iter=max_iter,
    )
    return res


def ppr_scores(result_state: DataFrame, decimals: int = 6) -> DataFrame:
    """(v, p, r) rounded for replayable output, support rows only,
    ordered-stable columns."""
    return result_state.select(
        "v",
        F.round("p", decimals).alias("p"),
        F.round("r", decimals).alias("r"),
    )


def sweep_cut(
    graph: EdgeTable, scores: DataFrame, k: int = 16
) -> DataFrame:
    """Conductance sweep over the top-``k`` vertices by p(v)/deg(v).

    ``graph`` must be the symmetrized (undirected) edge table the
    scores were computed on. Returns DataFrame[rank int, v long,
    phi double]: for each prefix S_rank of the sweep order,
    ``phi`` = cut(S)/min(vol(S), vol(V)-vol(S)) (NULL when the
    denominator is 0, i.e. S covers the whole volume).

    Sweep order: (round(p/deg, 9) desc, v asc) — the rounded score is
    the sort key so the prefix set replays bit-identically across
    engines. Selection is TakeOrdered (per-partition heads, no global
    sort); the only window runs over the <= k selected rows.

    cut/vol identity used (S = prefix set, directed-pair counting over
    the symmetrized table): vol(S) = sum of deg, internal(S) = number
    of symmetrized edges with BOTH endpoints in S (counts each
    undirected edge twice, matching vol), cut(S) = vol(S) - internal(S).
    """
    deg = graph.degrees.select("v", F.col("out_degree").alias("d"))
    cand = (
        scores.join(deg, "v")
        .where(F.col("d") > 0)
        .select(
            "v",
            "d",
            F.round(F.col("p") / F.col("d"), 9).alias("score"),
        )
        .orderBy(F.desc("score"), "v")
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), "v")
    ranked = cand.select(
        "v", "d", F.row_number().over(w).cast("long").alias("rank")
    ).localCheckpoint(eager=True)

    two_m = graph.num_edges()  # symmetrized: = vol(V)

    r_src = ranked.select(F.col("v").alias("src"), F.col("rank").alias("ru"))
    r_dst = ranked.select(F.col("v").alias("dst"), F.col("rank").alias("rv"))
    internal = (
        graph.edges.join(F.broadcast(r_src), "src")
        .join(F.broadcast(r_dst), "dst")
        .select(F.greatest("ru", "rv").alias("mr"))
        .groupBy("mr")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    wr = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(internal, ranked["rank"] == internal["mr"], "left")
        .select(
            "rank",
            "v",
            "d",
            F.coalesce("n_int", F.lit(0)).alias("n_int"),
        )
        .select(
            "rank",
            "v",
            F.sum("d").over(wr).alias("vol"),
            F.sum("n_int").over(wr).alias("internal"),
        )
    )
    return sweep.select(
        "rank",
        "v",
        F.round(
            (F.col("vol") - F.col("internal"))
            / F.nullif(
                F.least(F.col("vol"), F.lit(two_m) - F.col("vol")),
                F.lit(0),
            ).cast("double"),
            6,
        ).alias("phi"),
    )
