"""Louvain synchronous modularity-gain moves (algorithms/louvain.py)."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.louvain import louvain, louvain_communities
from gunrock_spark.algorithms.modularity import modularity
from gunrock_spark.graph.edge_table import EdgeTable


def _clique_pair(spark):
    cl1 = [(a, b) for a in range(5) for b in range(5) if a != b]
    cl2 = [(a + 10, b + 10) for a in range(5) for b in range(5) if a != b]
    return EdgeTable.from_df(
        spark.createDataFrame(cl1 + cl2 + [(0, 10)], "src long, dst long")
    )


def test_two_cliques_two_communities(spark):
    g = _clique_pair(spark)
    rows = louvain_communities(g, max_iter=8).collect()
    by_comm = {}
    for r in rows:
        by_comm.setdefault(r.community, set()).add(r.v)
    assert sorted(map(sorted, by_comm.values())) == [
        [0, 1, 2, 3, 4],
        [10, 11, 12, 13, 14],
    ]
    q = modularity(
        g,
        louvain_communities(g, max_iter=8).select(
            "v", F.col("community").alias("label")
        ),
    ).collect()[0].modularity
    assert q > 0.3


def _python_louvain(edges, k):
    """Replica of the synchronous dynamics: identical comparator,
    identical double-op order, identical smallest-community tie-break."""
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    adj = {}
    for s, d in sym:
        adj.setdefault(s, []).append(d)
    kv = {v: len(ns) for v, ns in adj.items()}
    two_m = float(len(sym))
    c = {v: v for v in adj}
    for _ in range(k):
        tot = {}
        for v in adj:
            tot[c[v]] = tot.get(c[v], 0) + kv[v]
        new = {}
        for v in adj:
            kvc = {c[v]: 0}
            for u in adj[v]:
                kvc[c[u]] = kvc.get(c[u], 0) + 1
            best = None
            for nc, kk in kvc.items():
                own = kv[v] if nc == c[v] else 0
                score = float(kk) - (float(kv[v]) * float(tot[nc] - own)) / two_m
                key = (score, -nc)
                if best is None or key > best[0]:
                    best = (key, nc)
            new[v] = best[1]
        c = new
    return c


def test_matches_python_replica(spark):
    edges = sorted(
        {((i * 7) % 29, (i * 13 + 3) % 29) for i in range(120)}
        - {(v, v) for v in range(29)}
    )
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    for k in (1, 2, 3):
        got = {
            r.v: r.community
            for r in louvain_communities(g, max_iter=k, gate="all").collect()
        }
        want = _python_louvain(edges, k)
        assert got == want, f"round {k} diverged"


def test_deterministic_under_partitioning(spark):
    edges = [((i * 5) % 17, (i * 11 + 1) % 17) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        map(
            tuple,
            louvain_communities(EdgeTable.from_df(df), max_iter=3).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            louvain_communities(
                EdgeTable.from_df(df.repartition(13)), max_iter=3
            ).collect(),
        )
    )
    assert a == b


def test_converges_and_reports_metrics(spark):
    g = _clique_pair(spark)
    res = louvain(g, max_iter=10)
    assert res.converged
    assert res.metrics[-1]["changed"] == 0
    assert res.iterations <= 10


def _python_louvain_weighted(edges_w, k):
    sym = {}
    for s_, d, w in edges_w:
        if s_ != d:
            sym[(s_, d)] = min(w, sym.get((s_, d), w))
            sym[(d, s_)] = min(w, sym.get((d, s_), w))
    adj = {}
    for (s_, d), w in sym.items():
        adj.setdefault(s_, []).append((d, w))
    kv = {v: float(sum(w for _, w in ns)) for v, ns in adj.items()}
    two_m = float(sum(sym.values()))
    c = {v: v for v in adj}
    for _ in range(k):
        tot = {}
        for v in adj:
            tot[c[v]] = tot.get(c[v], 0.0) + kv[v]
        new = {}
        for v in adj:
            kvc = {c[v]: 0.0}
            for u, w in adj[v]:
                kvc[c[u]] = kvc.get(c[u], 0.0) + w
            best = None
            for nc, kk in kvc.items():
                own = kv[v] if nc == c[v] else 0.0
                score = kk - (kv[v] * (tot[nc] - own)) / two_m
                key = (score, -nc)
                if best is None or key > best[0]:
                    best = (key, nc)
            new[v] = best[1]
        c = new
    return c


def test_weighted_matches_python_replica(spark):
    edges = sorted(
        {((i * 7) % 19, (i * 5 + 2) % 19) for i in range(60)}
        - {(v, v) for v in range(19)}
    )
    rows = [(s, d, float((s * 3 + d) % 5 + 1)) for s, d in edges]
    g = EdgeTable.from_df(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        weight="weight",
    )
    for k in (1, 2):
        got = {
            r.v: r.community
            for r in louvain_communities(g, max_iter=k, gate="all").collect()
        }
        want = _python_louvain_weighted(rows, k)
        assert got == want, f"weighted round {k} diverged"
