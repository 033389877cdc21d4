"""Minimum spanning forest (algorithms/msf.py) against a pure-Python
Kruskal — valid because the (w, a, b) keys are distinct, so the MSF
is unique and algorithm-independent."""

from __future__ import annotations

import random

from gunrock_spark.algorithms.msf import minimum_spanning_forest
from gunrock_spark.graph.edge_table import EdgeTable


def _kruskal(und):
    """und: {(a, b): w} canonical. Returns the unique MSF edge set."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, a, b in sorted((w, a, b) for (a, b), w in und.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def _und(edges):
    und = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        w = float((s * 7 + d * 13) % 19 + 1)
        und[(a, b)] = min(und.get((a, b), w), w)
    return und


def _graph(spark, edges):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "weight", ((F.col("src") * 7 + F.col("dst") * 13) % 19 + 1).cast("double")
    )
    return EdgeTable.from_df(df, weight="weight")


def test_msf_matches_kruskal_random(spark):
    rng = random.Random(17)
    edges = sorted({(rng.randrange(60), rng.randrange(60)) for _ in range(200)})
    got = {
        (r.a, r.b, r.w)
        for r in minimum_spanning_forest(_graph(spark, edges)).collect()
    }
    assert got == _kruskal(_und(edges))


def test_msf_forest_size_and_disconnected(spark):
    # two disjoint triangles + an isolated chain: |F| = |V| - #components
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (20, 21)]
    g = _graph(spark, edges)
    rows = minimum_spanning_forest(g).collect()
    verts = {x for e in edges for x in e}
    assert len(rows) == len(verts) - 3
    assert {(r.a, r.b, r.w) for r in rows} == _kruskal(_und(edges))


def test_msf_empty_and_selfloop_only(spark):
    got = minimum_spanning_forest(_graph(spark, [(5, 5)])).collect()
    assert got == []
