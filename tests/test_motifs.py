"""4-cycle counting (algorithms/motifs.py) vs brute-force oracles."""

import itertools

import pytest

from gunrock_spark.algorithms.motifs import (
    square_count,
    square_count_df,
    squares_per_vertex,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges


def _sym(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return s


def squares_ref(edges):
    """Brute force: count 4-vertex cycles a-b-c-d (each once) and the
    per-vertex incidence."""
    sym = _sym(edges)
    verts = sorted({v for e in sym for v in e})
    total = 0
    per_v = {v: 0 for v in verts}
    for quad in itertools.combinations(verts, 4):
        for perm in itertools.permutations(quad[1:]):
            cyc = (quad[0],) + perm
            if all(
                (cyc[i], cyc[(i + 1) % 4]) in sym for i in range(4)
            ):
                total += 1
                for v in cyc:
                    per_v[v] += 1
    # each cycle counted twice (both orientations) in the permutation sweep
    assert total % 2 == 0
    for v in per_v:
        per_v[v] //= 2
    return total // 2, per_v


def test_squares_square_graph(spark):
    # a single 4-cycle 0-1-2-3
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    assert square_count(g) == 1
    got = {r["v"]: r["squares"] for r in squares_per_vertex(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_squares_k4(spark):
    # K4 has 3 distinct 4-cycles, each through all 4 vertices
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = EdgeTable.from_df(edges_df(spark, k4))
    assert square_count(g) == 3
    got = {r["v"]: r["squares"] for r in squares_per_vertex(g).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_squares_toy7_vs_bruteforce(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    want_total, want_pv = squares_ref(clean_edges(G_TOY7))
    assert square_count(g) == want_total
    got = {r["v"]: r["squares"] for r in squares_per_vertex(g).collect()}
    assert got == want_pv
    assert square_count_df(g).collect()[0]["squares"] == want_total


def test_squares_rmat_vs_bruteforce(spark):
    edges = [tuple(map(int, e)) for e in rmat_edges(scale=4, edge_factor=3, seed=5)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    want_total, want_pv = squares_ref(clean_edges(edges))
    assert square_count(g) == want_total
    got = {r["v"]: r["squares"] for r in squares_per_vertex(g).collect()}
    assert got == want_pv


def test_squares_center_cap_drops_hub_wedges(spark):
    # star + one square: capping below the hub degree removes the
    # hub-centered wedges but keeps the square
    hub_edges = [(0, i) for i in range(1, 8)]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    g = EdgeTable.from_df(edges_df(spark, hub_edges + square))
    assert square_count(g) == 1
    assert square_count(g, max_center_degree=2) == 1
