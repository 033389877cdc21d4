import pyspark.sql.functions as F

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_PR4, edges_df, rmat_edges


def test_cleaning_drops_self_loops_and_duplicates(spark):
    raw = edges_df(spark, [(0, 1), (0, 1), (1, 1), (2, 0), (0, 1)])
    g = EdgeTable.from_df(raw)
    got = sorted(tuple(r) for r in g.edges.collect())
    assert got == [(0, 1), (2, 0)]


def test_symmetrize(spark):
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 0), (1, 2)]), symmetrize=True)
    got = sorted(tuple(r) for r in g.edges.collect())
    assert got == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_degrees(spark):
    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    deg = {r["v"]: (r["out_degree"], r["in_degree"]) for r in g.degrees.collect()}
    # G_PR4: out-degrees 0:2 1:1 2:3 3:2; in-degrees 0:3 1:2 2:1 3:2
    assert deg == {0: (2, 3), 1: (1, 2), 2: (3, 1), 3: (2, 2)}
    assert g.num_vertices() == 4
    assert g.num_edges() == 8


def test_rmat_cleaning_matches_python_oracle(spark):
    from tests.oracles import clean_edges

    raw = rmat_edges(7, 8, seed=7)
    raw_list = [(int(s), int(d)) for s, d in raw]
    g = EdgeTable.from_df(edges_df(spark, raw_list))
    got = set(tuple(r) for r in g.edges.collect())
    assert got == set(clean_edges(raw_list))


def test_degree_histogram(spark):
    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    hist = {r["log2_degree"]: r["n_vertices"] for r in g.degree_histogram().collect()}
    # out-degrees: 2,1,3,2 -> log2 floor: 1,0,1,1
    assert hist == {0: 1, 1: 3}


def test_rgg_and_small_world_generators(spark):
    """Seeded RGG + Watts-Strogatz (reference graphio parity,
    rgg.cuh:123-126 / small_world.cuh:28-46): deterministic,
    symmetric, self-loop-free; CC over RGG is mostly-connected at the
    default threshold."""
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import (
        edges_df,
        rgg_edges,
        small_world_edges,
    )

    r = rgg_edges(300, seed=3)
    assert (r == rgg_edges(300, seed=3)).all()
    assert all(s != d for s, d in r)
    pairs = {(int(s), int(d)) for s, d in r}
    assert all((d, s) in pairs for s, d in pairs)  # symmetric

    sw = small_world_edges(100, k=4, p=0.1, seed=3)
    swp = {(int(s), int(d)) for s, d in sw}
    assert all((d, s) in swp for s, d in swp)
    g = EdgeTable.from_df(edges_df(spark, sorted(swp)))
    res = connected_components(g)
    n_comp = res.state.select("label").distinct().count()
    assert n_comp == 1  # ring lattice stays connected under rewiring
