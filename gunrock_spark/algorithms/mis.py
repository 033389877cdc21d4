"""Maximal independent set — deterministic Luby rounds.

Luby's classic parallel MIS: each round every ALIVE vertex draws a
priority; a vertex whose priority is strictly smaller than every
alive neighbor's joins the MIS, its neighbors die, repeat until no
vertex is alive. O(log |V|) rounds with high probability.

Determinism (the engine-wide contract, same as walks/sampling): the
priority is a 60-bit md5 hash of (vertex, round) — h60, the exact
function the DuckDB oracles can replicate — so reruns and the SQL
oracle see identical draws. Priority ties (h60 collisions) select
NEITHER endpoint that round — both engines agree — and the pair is
re-drawn with fresh hashes next round, so ties never deadlock.

Shape per round (all Catalyst, no UDF): two semi-joins restrict the
symmetrized edge list to alive-alive edges, one partial-agg MIN per
dst gives the neighborhood's best priority, a left join + filter
selects winners, one more join marks their neighbors dead. Everything
is |E_alive|-bounded and shrinks geometrically; the loop runs through
engine/iterate.py (metrics, lineage cuts, checkpoint/resume).

The reference has no MIS app (its `sample` skeleton is the nearest
template, gunrock/app/sample/sample_problem.cuh:27-37) — this is a
pipeline-completeness primitive (MIS is the standard building block
for parallel graph coloring / scheduling / sparsification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable

# larger than any 60-bit priority; stands in for "no alive neighbor"
_NO_NEIGHBOR = 1 << 62

ALIVE, IN_MIS, REMOVED = 0, 1, 2


def _round_priority(i: int):
    return h60(F.concat(F.col("v").cast("string"), F.lit(f":{i}")))


def maximal_independent_set(
    graph: EdgeTable, max_iter: int = 40, **engine_kw
) -> IterationResult:
    """``result.state`` is DataFrame[v, in_mis boolean] over all
    vertices: a maximal independent set of the UNDIRECTED graph
    (self-loops are already dropped by EdgeTable)."""
    spark = graph.edges.sparkSession
    edges = graph.symmetrized().edges.select("src", "dst")
    state = (
        graph.vertices.select("v", F.lit(ALIVE).alias("status"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        alive = cur.where(F.col("status") == ALIVE).select("v")
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
        sel = (
            pri.join(nb, "v", "left")
            .where(F.col("p") < F.coalesce("nb_min", F.lit(_NO_NEIGHBOR)))
            .select("v", F.lit(1).alias("_sel"))
        )
        dead = (
            e.join(sel.withColumnRenamed("v", "src"), "src", "left_semi")
            .select(F.col("dst").alias("v"))
            .distinct()
            .select("v", F.lit(1).alias("_dead"))
        )
        new = (
            cur.join(sel, "v", "left")
            .join(dead, "v", "left")
            .select(
                "v",
                F.when(F.col("status") != ALIVE, F.col("status"))
                .when(F.col("_sel").isNotNull(), F.lit(IN_MIS))
                .when(F.col("_dead").isNotNull(), F.lit(REMOVED))
                .otherwise(F.lit(ALIVE))
                .alias("status"),
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            return {"alive": materialized.where(F.col("status") == ALIVE).count()}

        return new, metrics

    res = iterate(
        state,
        step,
        stop=lambda m: m["alive"] == 0,
        max_iter=max_iter,
        **engine_kw,
    )
    final = res.state.select("v", (F.col("status") == IN_MIS).alias("in_mis"))
    return IterationResult(
        state=final,
        iterations=res.iterations,
        converged=res.converged,
        metrics=res.metrics,
        elapsed_sec=res.elapsed_sec,
    )
