"""4-cycle (rectangle) counting — the motif family one step past the
reference's triangle counter (gunrock/app/tc/, whose wedge-closure
join this extends from length-2 paths closing into triangles to
wedge PAIRS closing into rectangles).

Identity (Chiba–Nishizeki / butterfly counting): with
codeg(u, w) = |N(u) ∩ N(w)| over the undirected graph,

    #C4           = (1/2) * sum over pairs u < w of C(codeg(u, w), 2)
    #C4 through v =         sum over pairs containing v of C(codeg, 2)

Every 4-cycle a-b-c-d has exactly two diagonal pairs ({a,c}, {b,d}),
each contributing one wedge pair — hence the /2 for the total, and
exactly one diagonal containing any given cycle vertex — hence no
correction for the per-vertex counts. All quantities are integers:
both engines compute them in exact arithmetic, so the DuckDB oracle
matches bit-for-bit.

Spark plan: the symmetrized edge table (hash-partitioned by src,
built once, shared with CC/LP/TC) self-joins on the wedge center —
Catalyst sees both sides partitioned on the join key, so the wedge
enumeration is exchange-free — then one partial-agg groupBy on the
endpoint pair. Wedge volume is sum over centers of C(deg, 2): on a
power-law web graph a 10^6-degree hub alone contributes ~5*10^11
wedges, which is intrinsic to the exact count (the count IS the
wedge-pair statistic), so ``max_center_degree`` offers the same
documented contract knob as linkpred/jaccard: skip hub centers and
return the count over the degree-capped wedge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def _codegree(graph: EdgeTable, max_center_degree: int | None) -> DataFrame:
    """(u, w, c): common-neighbor counts over the undirected view for
    every endpoint pair u < w with c >= 1."""
    sym = graph.symmetrized()
    edges = sym.edges
    if max_center_degree is not None:
        ok = (
            sym.degrees.where(F.col("out_degree") <= max_center_degree)
            .select(F.col("v").alias("src"))
        )
        edges = edges.join(ok, "src")
    e1 = edges.select(F.col("src").alias("x"), F.col("dst").alias("u"))
    e2 = edges.select(F.col("src").alias("x"), F.col("dst").alias("w"))
    return (
        e1.join(e2, "x")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def square_count(graph: EdgeTable, max_center_degree: int | None = None) -> int:
    """Total number of (not necessarily induced) 4-cycles in the
    undirected view. Exact integer; ``max_center_degree`` caps wedge
    centers (documented approximation for hub-dominated graphs)."""
    codeg = _codegree(graph, max_center_degree)
    row = codeg.agg(
        F.sum(F.expr("c * (c - 1) div 2")).alias("s")
    ).collect()[0]
    return int(row["s"] or 0) // 2


def square_count_df(
    graph: EdgeTable, max_center_degree: int | None = None
) -> DataFrame:
    """1-row DataFrame[squares long] — :func:`square_count` as a plan."""
    codeg = _codegree(graph, max_center_degree)
    return codeg.agg(
        F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0)).alias("s")
    ).select(F.expr("s div 2").cast("long").alias("squares"))


def squares_per_vertex(
    graph: EdgeTable, max_center_degree: int | None = None
) -> DataFrame:
    """DataFrame[v, squares]: 4-cycles through each vertex (0-filled
    over all vertices). v's cycles are counted at its diagonal — each
    cycle has exactly one diagonal containing v, so no double count."""
    codeg = _codegree(graph, max_center_degree).withColumn(
        "pairs", F.expr("c * (c - 1) div 2")
    )
    per_end = (
        codeg.select(F.col("u").alias("v"), "pairs")
        .unionByName(codeg.select(F.col("w").alias("v"), "pairs"))
        .groupBy("v")
        .agg(F.sum("pairs").cast("long").alias("squares"))
    )
    return (
        graph.vertices.join(per_end, "v", "left")
        .select(
            "v", F.coalesce("squares", F.lit(0)).cast("long").alias("squares")
        )
    )
