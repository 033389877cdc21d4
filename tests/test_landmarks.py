"""Landmark distance sketches (algorithms/landmarks.py) vs exact BFS."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.landmarks import (
    estimate_distances,
    landmark_distances,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges


def _sym_adj(edges):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return adj


def bfs_ref(adj, src):
    dist, frontier, d = {src: 0}, {src}, 0
    while frontier:
        d += 1
        nxt = set()
        for v in frontier:
            for n in adj.get(v, ()):
                if n not in dist:
                    dist[n] = d
                    nxt.add(n)
        frontier = nxt
    return dist


def test_landmark_distances_are_exact_bfs(spark):
    edges = [tuple(map(int, e)) for e in rmat_edges(scale=5, edge_factor=4, seed=2)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    got = {}
    for r in landmark_distances(g, k=3).collect():
        got.setdefault(r["landmark"], {})[r["v"]] = r["dist"]
    adj = _sym_adj(clean_edges(edges))
    assert len(got) == 3
    for lm, dists in got.items():
        assert dists == bfs_ref(adj, lm)


def test_estimates_are_valid_upper_bounds(spark):
    edges = [tuple(map(int, e)) for e in rmat_edges(scale=5, edge_factor=4, seed=2)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    sketch = landmark_distances(g, k=4)
    verts = sorted({v for e in clean_edges(edges) for v in e})[:8]
    pairs = spark.createDataFrame(
        [(u, w) for u in verts for w in verts if u < w], schema="u long, w long"
    )
    est = {(r["u"], r["w"]): r["est"] for r in estimate_distances(sketch, pairs).collect()}
    adj = _sym_adj(clean_edges(edges))
    for (u, w), e in est.items():
        true = bfs_ref(adj, u).get(w)
        assert true is not None
        assert e >= true  # upper bound
    # a landmark's own pair is exact: (landmark, x) estimate == d(l, x)
    lms = sorted({r["landmark"] for r in sketch.collect()})
    lm = lms[0]
    lp = spark.createDataFrame(
        [(lm, v) for v in verts if v != lm], schema="u long, w long"
    )
    for r in estimate_distances(sketch, lp).collect():
        assert r["est"] == bfs_ref(adj, lm)[r["w"]]


def test_landmark_path_graph_exact(spark):
    # path 0-1-2-3-4 with landmark forced at 0: distances 0..4
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]))
    lms = g.edges.sparkSession.createDataFrame([(0,)], schema="source long")
    got = {r["v"]: r["dist"] for r in landmark_distances(g, landmarks=lms).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
