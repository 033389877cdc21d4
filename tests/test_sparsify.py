"""Degree-proportional edge sparsification (graph/sparsify.py)."""

import math

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.sparsify import HASH_A, HASH_B, HASH_P, sparsify_edges


def _graph(spark, edges):
    return EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))


def _py_keep(edges, c, seed):
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = set()
    for u, v in edges:
        h1 = ((u % HASH_P) * HASH_A + (v % HASH_P) * HASH_B + seed) % HASH_P
        h = (h1 * HASH_A + seed) % HASH_P
        isq = math.floor(math.sqrt(float(deg[u] * deg[v])))
        if h * isq < c * HASH_P:
            out.add((u, v))
    return out


def _star_edges(n=60):
    # hub 0 with n spokes + a sparse ring among the spokes
    return [(0, i) for i in range(1, n + 1)] + [
        (i, i % 60 + 1) for i in range(1, 61, 7)
    ]


def test_matches_python_oracle(spark):
    edges = _star_edges()
    got = {
        (r.src, r.dst) for r in sparsify_edges(_graph(spark, edges), c=3).collect()
    }
    assert got == _py_keep(edges, 3, 42)


def test_low_degree_edges_always_kept(spark):
    # every product d_u*d_v <= c^2 -> isqrt <= c -> h*isq < c*P always
    edges = [(1, 2), (3, 4), (5, 6)]
    got = sparsify_edges(_graph(spark, edges), c=2).collect()
    assert len(got) == 3


def test_hub_edges_thinned(spark):
    edges = _star_edges(200)
    g = _graph(spark, edges)
    kept = sparsify_edges(g, c=2).collect()
    hub_kept = sum(1 for r in kept if r.src == 0)
    # hub degree 200: spoke edges kept at ~2/sqrt(200*deg_spoke) << 1
    assert hub_kept < 120
    assert len(kept) < len(edges)


def test_deterministic_across_calls(spark):
    edges = _star_edges()
    g = _graph(spark, edges)
    a = sorted((r.src, r.dst) for r in sparsify_edges(g, c=3).collect())
    b = sorted((r.src, r.dst) for r in sparsify_edges(g, c=3).collect())
    assert a == b
