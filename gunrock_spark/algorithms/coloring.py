"""Greedy parallel graph coloring (Jones-Plassmann).

Jones & Plassmann (1993): repeatedly, every uncolored vertex that is
a strict LOCAL MINIMUM of a random priority among its uncolored
neighbors colors itself with the smallest color absent from its
already-colored neighborhood (the mex). Adjacent vertices never win
the same round (strict comparison), and the mex step keeps them
apart afterwards — a proper coloring in expected O(log |V|) rounds
on bounded-degree graphs, using at most Δ+1 colors.

The reference fork has no coloring app; later Gunrock versions ship
one built on exactly this independent-set pattern. Here it reuses
the engine's Luby-MIS round shape (algorithms/mis.py) plus a mex:

  priority      = h60(v ':' round) — fresh per round, so the h60-
                  collision tie rule ("neither endpoint wins") never
                  deadlocks; the SQL oracle replays the same draws.
  winner's mex  = min k in [0, deg(v)] not among colored-neighbor
                  colors — computed as explode(sequence(0, deg)) anti-
                  joined against the gathered neighbor colors: per
                  winner it is deg+1 candidate rows, the same cost
                  class as the neighbor gather itself, never a
                  per-vertex sorted array (hub-safe: a 10⁷-degree
                  hub contributes 10⁷ rows to a partial-agg MIN, not
                  a 10⁷-element array in one task).

Shape per round (all Catalyst): two semi-joins restrict edges to
uncolored-uncolored, one partial-agg MIN picks winners, one gather +
one sequence-explode + anti-join + partial-agg MIN assigns colors.
Everything is |E_alive| + Σ_winner deg bounded and shrinks
geometrically; the loop runs through engine/iterate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable

_NO_NEIGHBOR = 1 << 62  # larger than any 60-bit priority
_UNCOLORED = -1


def _round_priority(i: int):
    return h60(F.concat(F.col("v").cast("string"), F.lit(f":{i}")))


def minmax_coloring(
    graph: EdgeTable, max_iter: int = 60, **engine_kw
) -> IterationResult:
    """``result.state`` = DataFrame[v, color int]: proper coloring by
    the min-max parity scheme (the scheme Gunrock's later color app
    ships as its default): each round, alive vertices whose fresh
    h60 priority is a strict local MINIMUM among alive neighbors take
    color 2·round, strict local MAXIMA take 2·round+1 (a vertex that
    is both — no alive neighbors — takes the even color). Proper:
    same-class winners form an independent set, and a min-winner
    adjacent to a max-winner differs by parity. Two winner classes
    per round ≈ halves the rounds of one-sided JP at the cost of more
    colors (≤ 2·rounds instead of ≤ Δ+1) — the mex-free arithmetic
    is also what keeps the SQL oracle one MIN/MAX aggregate per
    round. Use :func:`greedy_coloring` when color count matters more
    than latency."""
    spark = graph.edges.sparkSession
    edges = graph.symmetrized().edges.select("src", "dst")
    state = (
        graph.vertices.select("v", F.lit(_UNCOLORED).cast("int").alias("color"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        alive = cur.where(F.col("color") == _UNCOLORED).select("v")
        pri = alive.select("v", _round_priority(i).alias("p"))
        e = (
            edges.join(alive.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("v", "dst"), "dst", "left_semi")
        )
        nb = (
            e.join(pri.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("p").alias("nb_min"), F.max("p").alias("nb_max"))
        )
        picked = (
            pri.join(nb, "v", "left")
            .select(
                "v",
                F.when(
                    F.col("p") < F.coalesce("nb_min", F.lit(_NO_NEIGHBOR)),
                    F.lit(2 * i),
                )
                .when(
                    F.col("p") > F.coalesce("nb_max", F.lit(-1)),
                    F.lit(2 * i + 1),
                )
                .cast("int")
                .alias("new_color"),
            )
            .where(F.col("new_color").isNotNull())
        )
        new = cur.join(picked, "v", "left").select(
            "v", F.coalesce("new_color", F.col("color")).alias("color")
        )

        def metrics(materialized: DataFrame) -> dict:
            return {
                "alive": materialized.where(F.col("color") == _UNCOLORED).count()
            }

        return new, metrics

    return iterate(
        state,
        step,
        stop=lambda m: m["alive"] == 0,
        max_iter=max_iter,
        **engine_kw,
    )


def greedy_coloring(
    graph: EdgeTable, max_iter: int = 60, **engine_kw
) -> IterationResult:
    """``result.state`` = DataFrame[v, color int] over all vertices:
    a proper coloring of the UNDIRECTED graph (no two adjacent
    vertices share a color), colors in [0, Δ]."""
    spark = graph.edges.sparkSession
    edges = graph.symmetrized().edges.select("src", "dst")
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    state = (
        graph.vertices.select("v", F.lit(_UNCOLORED).cast("int").alias("color"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        alive = cur.where(F.col("color") == _UNCOLORED).select("v")
        pri = alive.select("v", _round_priority(i).alias("p"))
        e = (
            edges.join(alive.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("v", "dst"), "dst", "left_semi")
        )
        nb = (
            e.join(pri.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("p").alias("nb_min"))
        )
        winners = (
            pri.join(nb, "v", "left")
            .where(F.col("p") < F.coalesce("nb_min", F.lit(_NO_NEIGHBOR)))
            .select("v")
        )
        # colored-neighbor colors of each winner (winner = edge dst)
        used = (
            edges.join(winners.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .join(
                cur.where(F.col("color") != _UNCOLORED).withColumnRenamed(
                    "v", "src"
                ),
                "src",
            )
            .select(F.col("dst").alias("v"), F.col("color").alias("k"))
            .distinct()
        )
        cands = winners.join(deg, "v").select(
            "v", F.explode(F.sequence(F.lit(0), F.col("d"))).alias("k")
        )
        mex = (
            cands.join(used, ["v", "k"], "left_anti")
            .groupBy("v")
            .agg(F.min("k").cast("int").alias("new_color"))
        )
        new = cur.join(mex, "v", "left").select(
            "v", F.coalesce("new_color", F.col("color")).alias("color")
        )

        def metrics(materialized: DataFrame) -> dict:
            return {
                "alive": materialized.where(F.col("color") == _UNCOLORED).count()
            }

        return new, metrics

    return iterate(
        state,
        step,
        stop=lambda m: m["alive"] == 0,
        max_iter=max_iter,
        **engine_kw,
    )
