"""Community-aware edge placement — the Spark analog of the
reference's graph-partitioner family.

The reference ships a pluggable partitioner layer that maps each
vertex to a GPU before any primitive runs: random
(gunrock/partitioner/random.cuh), biased-random
(app/brp/brp_partitioner.cuh), cluster
(app/cp/cp_partitioner.cuh) and a METIS bridge
(app/metisp/metis_partitioner.cuh) — all of them produce a
per-vertex ``partition_table`` and the multi-GPU advance exchanges
frontier entries whose neighbor lives on another GPU. What a
better-than-random placement buys is smaller exchange volume: fewer
edges cross partitions, so fewer remote scatter messages.

The Spark quantity that maps to "remote scatter messages" is the
shuffle WRITE of the advance+reduce scatter: ``groupBy(dst).agg(...)``
over per-edge contributions. The map-side partial aggregation emits
one row per DISTINCT (map partition, dst) pair, and those rows ARE
the shuffle write. If a map partition holds whole communities, its
edges point at few distinct dsts (mostly its own members), so partial
aggregation collapses harder and the exchange shrinks — the same
mechanism as the reference's cluster partitioner, realised through
Catalyst's partial-agg instead of a message queue.

Where it applies (and where it doesn't): edge-resident aggregations
— host/degree rollups, triangle-candidate scatter, motif counting,
any one-shot ``groupBy(dst)`` over edge columns — benefit directly
(measured in scripts/partition_ab.py). The ITERATIVE loops
(PageRank/CC/LP) deliberately keep hash(src) placement instead:
Catalyst makes the per-iteration state join exchange-free only under
hash co-partitioning, and trading a |V|-row state exchange for an
|E|-row edge re-shuffle per iteration is a net loss. The reference
faces no such trade because its exchange layer is explicit; in Spark
the partial agg is the exchange compressor, and placement is a lever
for the scatter side only.

Pipeline (all DataFrame ops, no driver-side community table):

1. communities  <- label_propagation(mode="mode", k rounds)
   (or caller-provided labels, e.g. host ids for a web graph — the
   reference's cp_partitioner similarly accepts an external
   clustering).
2. layout: communities ranked by edge mass (sum of member
   out-degrees; ties by smallest label), then snake/boustrophedon
   packed into P parts so heavy communities spread evenly:
   ``part = pos if block even else P-1-pos`` where
   ``block, pos = divmod(rank, P)``. The ranking is ONE global sort
   of the |C|-row community summary — a bounded, one-time layout
   cost, same class as the url-dictionary sort in ingest.
3. edges are placed by the SOURCE vertex's part (1D placement, the
   exact analog of the reference's per-vertex partition_table) and
   repartitioned by range so each Spark partition holds whole
   communities.

Placement never changes WHAT is computed — only where rows live —
so every primitive returns identical results on a placed graph
(tested), and ``edge_cut`` / ``scripts/partition_ab.py`` measure the
benefit (cut fraction and real shuffle-write bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from gunrock_spark.graph.edge_table import EdgeTable


def partition_layout(
    graph: EdgeTable,
    num_partitions: int,
    communities: DataFrame | None = None,
    lp_iters: int = 5,
) -> DataFrame:
    """Per-vertex partition map DataFrame[v, part] (part in [0, P)).

    ``communities``: DataFrame[v, label] — any clustering; defaults to
    ``lp_iters`` rounds of synchronous mode-label propagation (the
    engine's community primitive). Vertices missing from
    ``communities`` form singleton communities (label = v).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if communities is None:
        from gunrock_spark.algorithms.label_propagation import label_propagation

        communities = label_propagation(graph, mode="mode", max_iter=lp_iters).state.select(
            "v", "label"
        )
    members = graph.vertices.join(communities.select("v", "label"), "v", "left").select(
        "v", F.coalesce("label", F.col("v")).cast("long").alias("label")
    )
    # community mass = edges placed with it = sum of member out-degrees
    mass = (
        members.join(graph.degrees.select("v", "out_degree"), "v", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("out_degree", F.lit(0))).alias("mass"))
    )
    # one bounded global sort of the |C|-row summary (layout-time only)
    w = Window.orderBy(F.desc("mass"), F.asc("label"))
    ranked = mass.select("label", (F.row_number().over(w) - 1).alias("rank"))
    p = F.lit(num_partitions)
    block = (F.col("rank") / p).cast("long")
    pos = F.pmod(F.col("rank"), p)
    part = F.when(F.pmod(block, F.lit(2)) == 0, pos).otherwise(p - 1 - pos)
    layout = ranked.select("label", part.cast("int").alias("part"))
    return members.join(layout, "label", "inner").select("v", "part")


def place_edges(
    graph: EdgeTable, layout: DataFrame, num_partitions: int, persist: bool = True
) -> EdgeTable:
    """Re-home the edge table so each Spark partition holds whole
    communities (1D placement by part(src), like the reference's
    partition_table indexed by source vertex).

    Range-partitioning on the dense part ids gives ~1 part per Spark
    partition without murmur-collision imbalance; edges stay sorted by
    src within partitions so sort-merge joins reuse the ordering.
    """
    cols = ["src", "dst"] + (["weight"] if graph.weighted else [])
    placed = (
        graph.edges.join(layout.withColumnRenamed("v", "src"), "src", "left")
        .select(*cols, F.coalesce("part", F.lit(0)).alias("part"))
        .repartitionByRange(num_partitions, "part")
        .sortWithinPartitions("part", "src")
        .select(*cols)
    )
    if persist:
        placed = placed.persist(StorageLevel.MEMORY_AND_DISK)
    return EdgeTable(placed, weighted=graph.weighted)


def edge_cut(graph: EdgeTable, layout: DataFrame) -> DataFrame:
    """1-row DataFrame[cut_edges, total_edges, cut_frac] — fraction of
    edges whose endpoints land on different partitions. The static
    proxy for per-iteration exchange volume (the dynamic measurement
    is scripts/partition_ab.py's shuffle-write bytes)."""
    src_part = layout.select(F.col("v").alias("src"), F.col("part").alias("src_part"))
    dst_part = layout.select(F.col("v").alias("dst"), F.col("part").alias("dst_part"))
    tagged = graph.edges.select("src", "dst").join(src_part, "src").join(dst_part, "dst")
    return tagged.agg(
        F.sum((F.col("src_part") != F.col("dst_part")).cast("long")).alias("cut_edges"),
        F.count(F.lit(1)).alias("total_edges"),
        (
            F.sum((F.col("src_part") != F.col("dst_part")).cast("double")) / F.count(F.lit(1))
        ).alias("cut_frac"),
    )


def hash_layout(graph: EdgeTable, num_partitions: int) -> DataFrame:
    """Baseline random placement (the reference's
    partitioner/random.cuh): part = positive hash(v) mod P."""
    return graph.vertices.select(
        "v", F.pmod(F.xxhash64("v"), F.lit(num_partitions)).cast("int").alias("part")
    )
