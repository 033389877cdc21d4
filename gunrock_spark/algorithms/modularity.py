"""Graph modularity of a community assignment.

Re-creates the reference's modularity indicator
(gunrock/global_indicator/modularity.cuh:50-55, the documented
equation its advance+reduce implements):

    Q = sum over same-cluster edges (A_ij - k_i*k_j / 2m) / 2m
      = sum over same-cluster edges (2m - k_i*k_j) / (4 m^2)

with m = |E| (directed cleaned edges), k_i = out-degree of i
(modularity.cuh:54 "k_i: out degree of i"), A_ij = 1 for every edge
present. The reference evaluates the per-edge term with an ALL_EDGES
advance guarded by ``community_ids[src] == community_ids[dst]``
(ModularityFunctor::CondEdge, modularity.cuh:38-42) followed by a
global cub sum (modularity.cuh:115-120).

Spark plan (one pass, no iteration):
  edges ⋈ communities on src ⋈ communities on dst   [two shuffle
      joins against the |V|-row community table; Catalyst reuses the
      edge table's src hash-partitioning for the first join]
  → filter same community                            [the CondEdge]
  → ⋈ degrees on src, ⋈ degrees on dst
  → agg(sum(2m - k_src*k_dst)) / (4 m^2)             [the cub sum]
All four joins shuffle at most |E| rows once; the degree/community
sides are |V|-row tables — broadcast-able when vertices fit, plain
shuffle joins otherwise (the 10^12-vertex case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def conductance(graph: EdgeTable, communities: DataFrame) -> DataFrame:
    """Per-community conductance over the undirected (symmetrized)
    view — the standard cut-quality companion to :func:`modularity`
    (Kannan-Vempala-Vetta; the metric the reference's partitioner
    family tries to minimize as "edge cut",
    gunrock/partitioner/metis.cuh-era apps):

        phi(S) = cut(S) / min(vol(S), vol(V) - vol(S))

    with vol(S) = sum of symmetrized degrees of S's members and
    cut(S) = number of undirected edges with exactly one endpoint in
    S. Returns DataFrame[label, n_vertices, volume, cut, conductance];
    communities whose smaller side has zero volume score 0.0.

    Spark plan (one pass): the |E|-row symmetrized table joins the
    |V|-row label table on both endpoints (cut), the cached degree
    table joins it once (volume); both collapse through partial-agg
    groupBys keyed by label. One |E| shuffle + two |V| shuffles —
    the modularity shape, scale-safe at web size. The total volume is
    the cached symmetrized edge count (driver scalar, no extra scan
    when ``symmetrized()`` was already materialized by CC/LP).
    """
    sym = graph.symmetrized()
    comm = communities.select("v", "label")

    vol = (
        sym.degrees.join(comm, "v")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.sum("out_degree").cast("long").alias("volume"),
        )
    )
    cs = comm.select(F.col("v").alias("cs_v"), F.col("label").alias("src_label"))
    cd = comm.select(F.col("v").alias("cd_v"), F.col("label").alias("dst_label"))
    cut = (
        sym.edges.join(cs, sym.edges["src"] == cs["cs_v"])
        .join(cd, sym.edges["dst"] == cd["cd_v"])
        .where(F.col("src_label") != F.col("dst_label"))
        .groupBy(F.col("src_label").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    total_vol = float(sym.num_edges())  # = sum of symmetrized degrees
    min_side = F.least(
        F.col("volume").cast("double"), F.lit(total_vol) - F.col("volume")
    )
    return vol.join(cut, "label", "left").select(
        "label",
        "n_vertices",
        "volume",
        F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
        F.when(min_side <= 0, F.lit(0.0))
        .otherwise(F.coalesce("cut", F.lit(0)).cast("double") / min_side)
        .alias("conductance"),
    )


def modularity(graph: EdgeTable, communities: DataFrame) -> DataFrame:
    """Modularity Q of ``communities`` (DataFrame[v, label]) over the
    cleaned directed edge table. Returns a 1-row DataFrame[modularity]
    (double). Empty graph → Q = 0.0 (no edges, no intra-cluster mass).
    """
    m = graph.num_edges()
    if m == 0:
        return graph.edges.sparkSession.createDataFrame(
            [(0.0,)], schema="modularity double"
        )
    edges = graph.edges
    comm = communities.select("v", "label")
    deg = graph.degrees.select("v", "out_degree")

    cs = comm.select(F.col("v").alias("cs_v"), F.col("label").alias("cs_label"))
    cd = comm.select(F.col("v").alias("cd_v"), F.col("label").alias("cd_label"))
    ks = deg.select(F.col("v").alias("ks_v"), F.col("out_degree").alias("k_src"))
    kd = deg.select(F.col("v").alias("kd_v"), F.col("out_degree").alias("k_dst"))

    same = (
        edges.join(cs, edges["src"] == cs["cs_v"])
        .join(cd, edges["dst"] == cd["cd_v"])
        .where(F.col("cs_label") == F.col("cd_label"))
        .join(ks, F.col("src") == ks["ks_v"])
        .join(kd, F.col("dst") == kd["kd_v"])
    )
    total = same.agg(
        F.sum(
            F.lit(2.0 * m) - F.col("k_src").cast("double") * F.col("k_dst")
        ).alias("s")
    )
    return total.select(
        (F.coalesce(F.col("s"), F.lit(0.0)) / F.lit(4.0 * m * m)).alias("modularity")
    )
