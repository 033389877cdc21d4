"""Densest subgraph — greedy (2+2ε)-approximation by parallel peeling
(Bahmani, Kumar, Vazirani VLDB 2012, "Densest subgraph in streaming
and MapReduce").

Maximize density rho(S) = |E(S)| / |S| over the undirected view. Each
round removes EVERY vertex whose degree inside the surviving set is
at most 2(1+eps) * rho(S) — so the vertex set shrinks by a constant
factor per round and the loop ends after O(log n / eps) rounds, each
one Spark job of the PR-iteration shape (one |E|-row join + one
partial-agg groupBy + one |V|-row semi-join). The best-density round
seen is a (2+2eps)-approximation of the optimum.

Determinism/oracle contract: (1+eps) is a RATIONAL a/b, and the
removal test "deg > 2(1+eps) * rho" is evaluated in exact integers as

    deg * n_S * b > a * m_sym(S)        (m_sym = 2 |E(S)|)

so every round's survivor set — and therefore the whole trajectory —
is bit-identical across engines; DuckDB replays it exactly.

Reference analog: none (the reference ships k-core-free density apps
only as the TC/k-core family); this extends the peeling family of
``algorithms/kcore.py`` with the density objective.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


@dataclass
class DensestResult:
    """``rounds``: per-round trajectory (round, n_vertices, m_sym,
    density); ``members``: DataFrame[v] of the best-density round
    (ties -> earliest round); ``best_round`` / ``best_density``."""

    rounds: DataFrame
    members: DataFrame
    best_round: int
    best_density: float


def densest_subgraph(
    graph: EdgeTable,
    factor: tuple[int, int] = (3, 2),
    max_rounds: int = 64,
) -> DensestResult:
    """Peel with (1+eps) = factor[0]/factor[1] (default 3/2, i.e.
    eps = 0.5 — the paper's headline setting, ~log_1.5(n) rounds).

    Round r (survivors S): m_sym = |symmetrized directed edges inside
    S| (= 2 |E(S)|), density = m_sym / (2 n_S); survivors of round
    r+1 = { v : deg_S(v) * n_S * b > a * m_sym }. Stops when S is
    empty or max_rounds hit. Two driver-side scalar actions per round
    (the kcore/SSSP stop-metric pattern); per-round survivor sets are
    localCheckpointed so lineage stays flat.
    """
    a, b = factor
    if a <= b or b <= 0:
        raise ValueError("factor must encode (1+eps) > 1 as (a, b) with a > b > 0")
    sym = graph.symmetrized().edges
    spark = sym.sparkSession

    cur = graph.vertices.select("v").localCheckpoint(eager=True)
    stats: list[tuple[int, int, int, float]] = []
    best_round, best_density = -1, -1.0
    best_members = cur
    rnd = 0
    while rnd < max_rounds:
        n_s = cur.count()
        if n_s == 0:
            break
        inside = (
            sym.join(cur.withColumnRenamed("v", "src"), "src")
            .join(cur.withColumnRenamed("v", "dst"), "dst")
        )
        deg = inside.groupBy(F.col("src").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )
        m_sym = int(
            deg.agg(F.coalesce(F.sum("d"), F.lit(0)).alias("m")).collect()[0]["m"]
        )
        density = m_sym / (2.0 * n_s)
        stats.append((rnd, n_s, m_sym, density))
        if density > best_density:
            best_round, best_density, best_members = rnd, density, cur
        if m_sym == 0:
            break
        survivors = (
            cur.join(deg, "v", "left")
            .where(
                F.coalesce(F.col("d"), F.lit(0)) * F.lit(n_s) * F.lit(b)
                > F.lit(a) * F.lit(m_sym)
            )
            .select("v")
            .localCheckpoint(eager=True)
        )
        cur = survivors
        rnd += 1

    schema = "round int, n_vertices long, m_sym long, density double"
    if stats:
        rounds_df = spark.createDataFrame(stats, schema=schema)
    else:  # vertex-free graph (e.g. all self-loops): empty trajectory
        rounds_df = spark.range(0).selectExpr(
            "CAST(id AS INT) AS round",
            "id AS n_vertices",
            "id AS m_sym",
            "CAST(id AS DOUBLE) AS density",
        )
        best_density = 0.0
    return DensestResult(
        rounds=rounds_df,
        members=best_members,
        best_round=best_round,
        best_density=best_density,
    )
