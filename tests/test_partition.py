"""Community-aware partitioner (graph/partition.py) — the analog of
the reference's partitioner family (random.cuh, cp_partitioner.cuh,
metis_partitioner.cuh): layout validity, balance, cut quality vs the
random baseline on a planted-partition graph, and placement
transparency (identical primitive results on a placed graph)."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import planted_partition_edges_df
from gunrock_spark.graph.partition import (
    edge_cut,
    hash_layout,
    partition_layout,
    place_edges,
)

N, C, P = 2_000, 16, 8


@pytest.fixture(scope="module")
def planted(spark):
    raw = planted_partition_edges_df(spark, N, C, deg_in=10, deg_out=2, seed=7)
    g = EdgeTable.from_df(raw, num_partitions=P)
    layout = partition_layout(g, P, lp_iters=5).persist()
    layout.count()
    yield g, layout
    layout.unpersist()
    g.unpersist()


def test_layout_total_and_range(spark, planted):
    g, layout = planted
    rows = layout.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("v").alias("nv"),
        F.min("part").alias("lo"),
        F.max("part").alias("hi"),
    ).collect()[0]
    assert rows["n"] == rows["nv"] == g.num_vertices()
    assert rows["lo"] >= 0 and rows["hi"] <= P - 1


def test_layout_deterministic(spark, planted):
    g, layout = planted
    again = partition_layout(g, P, lp_iters=5)
    assert layout.exceptAll(again).count() == 0
    assert again.exceptAll(layout).count() == 0


def test_snake_packing_balances_edge_mass(spark, planted):
    g, layout = planted
    mass = (
        g.edges.join(layout.withColumnRenamed("v", "src"), "src")
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()
    )
    masses = [r["m"] for r in mass]
    assert len(masses) == P
    assert max(masses) <= 3 * (sum(masses) / len(masses))


def test_community_cut_beats_hash_cut(spark, planted):
    g, layout = planted
    cut_comm = edge_cut(g, layout).collect()[0]["cut_frac"]
    cut_hash = edge_cut(g, hash_layout(g, P)).collect()[0]["cut_frac"]
    # hash placement cuts ~ (P-1)/P of edges; LP-community placement
    # must recover most of the planted intra-community locality
    assert cut_hash > 0.75
    assert cut_comm < 0.5 * cut_hash


def test_placement_is_transparent_to_primitives(spark, planted):
    g, layout = planted
    placed = place_edges(g, layout, P)
    try:
        assert placed.num_edges() == g.num_edges()
        a = pagerank(g, max_iter=3).state.select("v", "rank")
        b = pagerank(placed, max_iter=3).state.select("v", "rank")
        diff = (
            a.join(b.withColumnRenamed("rank", "rank_b"), "v")
            .where(F.abs(F.col("rank") - F.col("rank_b")) > 1e-9)
            .count()
        )
        assert diff == 0
    finally:
        placed.unpersist()


def test_partial_agg_collapses_harder_on_placed_edges(spark, planted):
    """The mechanism behind the shuffle-byte win: distinct dsts per map
    partition (= partial-agg output rows = exchange rows) must shrink
    under community placement."""
    g, layout = planted
    placed = place_edges(g, layout, P)

    def exchange_rows(edges):
        return (
            edges.withColumn("pid", F.spark_partition_id())
            .select("pid", "dst")
            .distinct()
            .count()
        )

    try:
        assert exchange_rows(placed.edges) < 0.6 * exchange_rows(g.edges)
    finally:
        placed.unpersist()


def test_contract_by_labels_matches_hand_oracle(spark):
    """Quotient graph of a 6-vertex toy under a 2-community labeling:
    weights count collapsed original edges; self-loops carry the
    intra-community mass; drop_self_loops removes exactly them."""
    from gunrock_spark.graph.coarsen import contract_by_labels

    #  A = {0,1,2}, B = {3,4,5}
    edges = [(0, 1), (1, 2), (2, 0),          # A-internal: 3
             (3, 4), (4, 5),                  # B-internal: 2
             (0, 3), (1, 4),                  # A->B: 2
             (5, 2)]                          # B->A: 1
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    labels = spark.createDataFrame(
        [(v, 10 if v < 3 else 20) for v in range(6)], "v long, label long"
    )
    got = {
        (r.src, r.dst): r.weight
        for r in contract_by_labels(g, labels).collect()
    }
    assert got == {(10, 10): 3, (20, 20): 2, (10, 20): 2, (20, 10): 1}
    no_loops = {
        (r.src, r.dst): r.weight
        for r in contract_by_labels(g, labels, drop_self_loops=True).collect()
    }
    assert no_loops == {(10, 20): 2, (20, 10): 1}


def test_contract_unlabeled_endpoint_drops_edge(spark):
    from gunrock_spark.graph.coarsen import contract_by_labels

    g = EdgeTable.from_df(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    )
    labels = spark.createDataFrame([(0, 7), (1, 7)], "v long, label long")
    got = {(r.src, r.dst): r.weight for r in contract_by_labels(g, labels).collect()}
    assert got == {(7, 7): 1}  # (1,2) dropped: 2 is unlabeled


def test_contract_sum_weights(spark):
    from gunrock_spark.graph.coarsen import contract_by_labels

    g = EdgeTable.from_df(
        spark.createDataFrame(
            [(0, 1, 5), (1, 0, 2), (0, 2, 3), (2, 1, 7)],
            "src long, dst long, w long",
        ),
        weight="w",
    )
    labels = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 200)], "v long, label long"
    )
    got = {
        (r.src, r.dst): r.weight
        for r in contract_by_labels(g, labels, sum_weights=True).collect()
    }
    assert got == {(100, 100): 7, (100, 200): 3, (200, 100): 7}

    import pytest as _pytest

    unweighted = EdgeTable.from_df(
        spark.createDataFrame([(0, 1)], "src long, dst long")
    )
    with _pytest.raises(ValueError):
        contract_by_labels(unweighted, labels, sum_weights=True)
