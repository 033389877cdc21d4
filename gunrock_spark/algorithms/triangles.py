"""Triangle counting — degree-ordered orientation + wedge-closure join.

The reference names TC as a Gunrock capability (README.md:180-182,
Wang et al. HPGP'16 — intersect adjacency lists per edge; helper
kernels in gunrock/util/join.cuh) but ships no app in this fork; the
north rule requires exact triangle counts.

Algorithm (the O(m^1.5)-work standard): treat the graph as undirected
(canonical edge (a,b) with a<b after cleaning), then orient every edge
from the lower-ranked to the higher-ranked endpoint where rank =
(degree, vertex id) lexicographic. Every triangle has exactly one
wedge at its lowest-ranked vertex, so

    wedges  = oriented e1 ⋈ oriented e2 on pivot u  (w1 < w2 by rank)
    closed  = wedges ⋈ oriented on (w1, w2)
    count   = count(closed)          -- never materialize wedge lists

The orientation bounds each pivot's fan-out by O(sqrt(m)), which is
what keeps the wedge join from exploding on power-law graphs — the
DataFrame analog of the reference's per-edge sorted intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def _oriented(graph: EdgeTable) -> DataFrame:
    """Undirected canonical edges oriented low-rank -> high-rank,
    rank = (undirected degree, v). Returns DataFrame[u, w]."""
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )


def _closed_wedges(graph: EdgeTable) -> DataFrame:
    """DataFrame[u, w1, w2] — one row per triangle (u = lowest-ranked)."""
    o = _oriented(graph).persist()
    e1 = o.select(F.col("u").alias("u"), F.col("w").alias("w1"))
    e2 = o.select(F.col("u").alias("u"), F.col("w").alias("w2"))
    # each unordered pair {w1, w2} once: w1 < w2 by vertex id is enough
    # (both orientations of the closing edge are checked below)
    wedges = e1.join(e2, "u").where(F.col("w1") < F.col("w2"))
    closing = o.select(
        F.least("u", "w").alias("w1"), F.greatest("u", "w").alias("w2")
    )
    return wedges.join(closing, ["w1", "w2"]).select("u", "w1", "w2")


def triangle_count(graph: EdgeTable) -> int:
    """Exact global triangle count (undirected semantics)."""
    return _closed_wedges(graph).count()


def triangle_count_df(graph: EdgeTable) -> DataFrame:
    """Global count as a 1-row DataFrame[n_triangles long] (for the
    correctness harness)."""
    return _closed_wedges(graph).agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count_per_vertex(graph: EdgeTable) -> DataFrame:
    """DataFrame[v, n_triangles] — triangles incident to each vertex
    (every triangle credits all three corners); vertices in no triangle
    are included with 0."""
    tri = _closed_wedges(graph)
    corners = (
        tri.select(F.col("u").alias("v"))
        .unionByName(tri.select(F.col("w1").alias("v")))
        .unionByName(tri.select(F.col("w2").alias("v")))
    )
    counts = corners.groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    return graph.vertices.join(counts, "v", "left").select(
        "v", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )
