"""Spectral bisection (algorithms/spectral.py) vs a numpy replay of
the identical fixed-trajectory power iteration, plus the structural
property the op exists for: the Fiedler sign separates a planted
two-cluster graph."""

from __future__ import annotations

import math
import random

import pytest

from gunrock_spark.algorithms.spectral import (
    SPECTRAL_A,
    SPECTRAL_P,
    spectral_bisection,
)
from gunrock_spark.graph.edge_table import EdgeTable


def _barbell(k=8):
    """Two k-cliques joined by one bridge edge (0..k-1 | k..2k-1)."""
    es = []
    for base in (0, k):
        for a in range(k):
            for b in range(a + 1, k):
                es.append((base + a, base + b))
    es.append((k - 1, k))
    return es


def _py_replay(edges, n_iter, seed):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    verts = sorted(adj)
    deg = {v: float(len(adj[v])) for v in verts}
    c = max(deg.values()) + 1.0
    x = {v: ((v * SPECTRAL_A + seed) % SPECTRAL_P) / SPECTRAL_P - 0.5 for v in verts}
    for _ in range(n_iter):
        y = {v: (c - deg[v]) * x[v] + sum(x[u] for u in adj[v]) for v in verts}
        n = len(verts)
        m = sum(y.values()) / n
        norm = math.sqrt(max(sum(val * val for val in y.values()) - n * m * m, 0.0))
        x = {v: (y[v] - m) / norm for v in verts}
    return x


def _graph(spark, edges):
    return EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))


def test_spectral_matches_numpy_replay(spark):
    rng = random.Random(5)
    edges = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(220)})
    edges = [(s, d) for s, d in edges if s != d]
    got = {r.v: r.f for r in spectral_bisection(_graph(spark, edges), n_iter=6).collect()}
    want = _py_replay(edges, 6, 42)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_spectral_sign_splits_barbell(spark):
    edges = _barbell(8)
    got = {r.v: r.f for r in spectral_bisection(_graph(spark, edges), n_iter=20).collect()}
    left = {v for v, f in got.items() if f < 0}
    right = {v for v, f in got.items() if f >= 0}
    assert {frozenset(left), frozenset(right)} == {
        frozenset(range(8)), frozenset(range(8, 16))
    }
