"""Spectral bisection — the Fiedler-vector partitioner, the min-cut
analog of the reference's METIS/CP partitioner family
(gunrock/app/metisp/metis_partitioner.cuh, app/cp/cp_partitioner.cuh
— semantic spec only): split vertices by the sign of the second
eigenvector of the graph Laplacian L = D - A of the undirected view.

Computed by power iteration on the shifted operator M = cI - L with
c = max_degree + 1 (all eigenvalues of M are then positive, and M's
TOP eigenvector not orthogonal to 1 is the Fiedler direction once the
trivial all-ones component is deflated):

    y(v)  = (c - d(v)) * x(v) + sum_{u ~ v} x(u)      one |E| join+agg
    m     = mean(y);  y' = y - m                       (deflate 1s)
    x     = y' / ||y'||                                (normalize)

A FIXED iteration count from a FIXED hash start vector makes the
whole trajectory deterministic — the same contract as
pipeline/pca.py's power iteration, so an unrolled SQL oracle replays
it to float noise and convergence tolerance never enters the
contract.

Scale shape (100 TB link graph): per iteration ONE neighbor-sum
equi-join + map-side-combined aggregation over the symmetrized layout
(exactly the PageRank iteration shape, reusing the cached symmetrized
edge table) plus one 3-scalar driver agg (sum, sum-of-squares, count
— mean and norm in a single pass); state is |V| rows, never
collected. No windows, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable

SPECTRAL_P = 900_000_007
SPECTRAL_A = 1_000_003


def spectral_bisection(
    graph: EdgeTable, n_iter: int = 8, seed: int = 42
) -> DataFrame:
    """DataFrame[v, f]: the power-iteration estimate of the Fiedler
    vector after exactly ``n_iter`` steps (f is the per-vertex
    coordinate; partition sides are sign(f), left to the caller so
    float-noise sign flips near 0 stay out of any equality contract).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    sym = graph.symmetrized()
    edges = sym.edges.select("src", "dst")
    deg = (
        edges.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    c = float(deg.agg(F.max("d")).collect()[0][0]) + 1.0

    # deterministic start in [-0.5, 0.5): h(v)/P - 0.5
    verts = sym.vertices
    x = verts.join(deg, "v", "left").select(
        "v",
        F.coalesce(F.col("d"), F.lit(0.0)).alias("d"),
        (
            F.pmod(F.col("v") * SPECTRAL_A + F.lit(int(seed)), F.lit(SPECTRAL_P))
            / F.lit(float(SPECTRAL_P))
            - F.lit(0.5)
        ).alias("x"),
    )
    # lineage cut per iteration: x is referenced TWICE per step (the
    # neighbor sum and the diagonal term), so an uncut plan doubles
    # each iteration — localCheckpoint keeps it constant-size, the
    # same per-iteration contract as the PageRank loop.
    x = x.localCheckpoint(eager=True)
    for _ in range(n_iter):
        nbr = (
            x.join(edges, x["v"] == edges["src"])
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.sum("x").alias("s"))
        )
        y = (
            x.join(nbr, x["v"] == nbr["nv"], "left")
            .select(
                "v",
                "d",
                (
                    (F.lit(c) - F.col("d")) * F.col("x")
                    + F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("y"),
            )
            .localCheckpoint(eager=True)
        )
        agg = y.agg(
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        m = float(agg["sy"]) / float(agg["n"])
        norm = math.sqrt(max(float(agg["syy"]) - float(agg["n"]) * m * m, 0.0))
        x = y.select(
            "v", "d", ((F.col("y") - F.lit(m)) / F.lit(norm)).alias("x")
        )
    return x.select("v", F.col("x").alias("f")).localCheckpoint(eager=True)
