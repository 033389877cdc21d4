"""Monte-Carlo SimRank (algorithms/simrank.py) against a pure-Python
replay of the coupled reverse-walk estimator."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from gunrock_spark.algorithms.simrank import simrank_scores
from gunrock_spark.algorithms.walks import HASH_A, HASH_P, HASH_STEP, HASH_WALK
from gunrock_spark.graph.edge_table import EdgeTable


def _rand_edges(n_v=50, n_e=260, seed=11):
    rng = random.Random(seed)
    es = {(rng.randrange(n_v), rng.randrange(n_v)) for _ in range(n_e)}
    return sorted((s, d) for s, d in es if s != d)


def _hash(cur, t, wid, seed):
    return ((cur % HASH_P) * HASH_A + t * HASH_STEP + (wid % HASH_P) * HASH_WALK + seed) % HASH_P


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_simrank(edges, n_queries, walk_length, walks_per_vertex, seed, salt=0):
    """The documented contract, straight-line Python: reverse walks
    from every vertex under the walks.py hash, first-meeting step per
    coupled pair, score = mean of 2^-tau."""
    radj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edges:
        radj.setdefault(d, []).append(s)
        verts.update((s, d))
    for v in radj:
        radj[v].sort()

    # walk position table: (start, walk) -> {step: vertex}, steps >= 1
    pos: dict[tuple[int, int], dict[int, int]] = {}
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            wid = v * walks_per_vertex + w
            cur = v
            trail = {}
            for t in range(1, walk_length + 1):
                nbrs = radj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_hash(cur, t, wid, seed) % len(nbrs)]
                trail[t] = cur
            pos[(v, w)] = trail

    queries = sorted(verts, key=lambda v: (_h60(f"{salt}:{v}"), v))[:n_queries]
    out = {}
    for q in queries:
        for u in verts:
            if u == q:
                continue
            total = 0.0
            for w in range(walks_per_vertex):
                qt, ut = pos[(q, w)], pos[(u, w)]
                taus = [t for t in qt if ut.get(t) == qt[t]]
                if taus:
                    total += 2.0 ** -min(taus)
            if total:
                out[(q, u)] = total / walks_per_vertex
    return out


def test_simrank_matches_python_oracle(spark):
    edges = _rand_edges()
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    got = {
        (r.q, r.v): r.score
        for r in simrank_scores(
            g, n_queries=3, walk_length=3, walks_per_vertex=4, seed=7
        ).collect()
    }
    want = _py_simrank(edges, 3, 3, 4, 7)
    assert got == want  # dyadic scores: exact float equality


def test_simrank_excludes_self_and_bounds(spark):
    edges = _rand_edges(seed=2)
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    rows = simrank_scores(
        g, n_queries=2, walk_length=2, walks_per_vertex=2, seed=3
    ).collect()
    assert all(r.q != r.v for r in rows)
    assert all(0.0 < r.score <= 1.0 for r in rows)


def test_simrank_explicit_queries(spark):
    # star into hub: 1->0, 2->0; reverse walks from 1 and 2 both step
    # to... (reverse graph: 0->{1,2}) — queries given explicitly.
    edges = [(1, 0), (2, 0), (3, 1), (3, 2)]
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    q = spark.createDataFrame([(1,), (2,)], "q long")
    got = {
        (r.q, r.v): r.score
        for r in simrank_scores(
            g, queries=q, walk_length=2, walks_per_vertex=2, seed=5
        ).collect()
    }
    want = _py_simrank_subset(edges, [1, 2], 2, 2, 5)
    assert got == want


def _py_simrank_subset(edges, queries, walk_length, walks_per_vertex, seed):
    full = _py_simrank(
        edges, 0, walk_length, walks_per_vertex, seed
    )  # n_queries=0 -> empty; recompute with explicit list
    radj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edges:
        radj.setdefault(d, []).append(s)
        verts.update((s, d))
    for v in radj:
        radj[v].sort()
    pos: dict[tuple[int, int], dict[int, int]] = {}
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            wid = v * walks_per_vertex + w
            cur, trail = v, {}
            for t in range(1, walk_length + 1):
                nbrs = radj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_hash(cur, t, wid, seed) % len(nbrs)]
                trail[t] = cur
            pos[(v, w)] = trail
    out = dict(full)
    for q in queries:
        for u in verts:
            if u == q:
                continue
            total = 0.0
            for w in range(walks_per_vertex):
                qt, ut = pos[(q, w)], pos[(u, w)]
                taus = [t for t in qt if ut.get(t) == qt[t]]
                if taus:
                    total += 2.0 ** -min(taus)
            if total:
                out[(q, u)] = total / walks_per_vertex
    return out
