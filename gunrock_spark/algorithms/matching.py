"""Maximal matching — deterministic locally-dominant edge matching.

The symmetric-breaking sibling of Luby MIS (algorithms/mis.py): where
MIS picks locally-minimal VERTICES, this picks locally-minimal EDGES.
The reference has no matching app, but matching is the standard
load-balancing/coarsening primitive its partitioner family leans on
conceptually (METIS coarsens by heavy-edge matching —
gunrock/app/metisp/metis_partitioner.cuh delegates to the METIS
library), so a Spark-first engine should carry it.

Algorithm (Hoepman 2004 / Manne-Bisseling locally-dominant matching,
specialized to unit weights with a deterministic total order):
  - canonical simple undirected edges (a < b), each with priority
    key = (h60(a:b), a, b) — a TOTAL order (the h60 breaks locality,
    the (a, b) suffix breaks the negligible-but-possible hash ties),
    so "strict local minimum" is well defined and the result is a
    pure function of the edge set.
  - round: an edge is MATCHED iff its key is the minimum among all
    alive edges incident to BOTH endpoints (a locally dominant edge).
    At least one such edge always exists (the global minimum), so
    every round makes progress; expected round count is O(log m).
  - remove every alive edge that shares an endpoint with a matched
    edge; repeat until no alive edges. Result is a MAXIMAL matching
    (greedy by the key order).

Spark plan per round (all partial-agg shapes, no windows, no Python):
  one |E_alive|-row explode to (vertex, key) pairs, one
  groupBy(vertex).min(key) — map-side combined — and two joins of the
  alive edges against that |V|-row minimum table, then an anti-join to
  drop dead edges. State is the alive+matched edge set; lineage is cut
  every round by engine.iterate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable


def _canonical_edges(graph: EdgeTable) -> DataFrame:
    """DataFrame[a, b, p]: simple undirected edges (a < b) with the
    deterministic 60-bit priority."""
    e = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    key = h60(
        F.concat_ws(":", F.col("a").cast("string"), F.col("b").cast("string"))
    )
    return e.select("a", "b", key.alias("p"))


def maximal_matching(graph: EdgeTable, max_iter: int = 64) -> IterationResult:
    """Greedy maximal matching: IterationResult whose state is
    DataFrame[a, b] — the matched edges (a < b). Deterministic: a pure
    function of the edge set (same contract as mis.py / coloring.py).
    """
    spark = graph.edges.sparkSession
    state = (
        _canonical_edges(graph)
        .select("a", "b", "p", F.lit(False).alias("matched"))
        .repartition(spark.sparkContext.defaultParallelism, "a")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        alive = cur.where(~F.col("matched"))
        ek = F.struct(F.col("p"), F.col("a"), F.col("b"))
        incident = alive.select(
            F.explode(F.array("a", "b")).alias("vtx"), ek.alias("k")
        )
        vmin = incident.groupBy("vtx").agg(F.min("k").alias("mk"))
        dominant = (
            alive.join(
                vmin.select(F.col("vtx").alias("va"), F.col("mk").alias("ka")),
                (F.col("a") == F.col("va")) & (ek == F.col("ka")),
            )
            .join(
                vmin.select(F.col("vtx").alias("vb"), F.col("mk").alias("kb")),
                (F.col("b") == F.col("vb")) & (ek == F.col("kb")),
            )
            .select("a", "b", "p")
        )
        matched_verts = dominant.select(F.explode(F.array("a", "b")).alias("mv")).distinct()
        survivors = (
            alive.join(matched_verts, alive["a"] == F.col("mv"), "left_anti")
            .join(matched_verts, F.col("b") == F.col("mv"), "left_anti")
        )
        # the 3-way union would otherwise TRIPLE the partition count
        # every round (the localCheckpoint preserves partitions) —
        # repartition back to the session parallelism so round r+1's
        # task count stays flat instead of growing 3^r
        new = (
            cur.where(F.col("matched"))
            .unionByName(dominant.select("a", "b", "p", F.lit(True).alias("matched")))
            .unionByName(survivors.select("a", "b", "p", F.lit(False).alias("matched")))
            .repartition(cur.sparkSession.sparkContext.defaultParallelism, "a")
        )

        def metrics(materialized: DataFrame) -> dict:
            counts = materialized.agg(
                F.sum(F.when(~F.col("matched"), 1).otherwise(0)).alias("alive"),
                F.sum(F.when(F.col("matched"), 1).otherwise(0)).alias("matched"),
            ).collect()[0]
            return {
                "alive": int(counts["alive"] or 0),
                "matched": int(counts["matched"] or 0),
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    result = iterate(state, step, stop=lambda m: m["alive"] == 0, max_iter=max_iter)
    result.state = result.state.where(F.col("matched")).select("a", "b")
    return result
