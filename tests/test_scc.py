"""SCC + bowtie decomposition vs a pure-Python Tarjan oracle."""

import pytest

from gunrock_spark.algorithms.scc import (
    bowtie_decomposition,
    strongly_connected_components,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from tests.oracles import clean_edges


def scc_ref(edge_list):
    """Iterative Tarjan; returns {v: min id in v's SCC}."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return out


def _run(spark, edge_list):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = strongly_connected_components(g)
    return {r["v"]: r["scc"] for r in res.state.collect()}, res


# two 3-cycles bridged by a path, plus a dangling tail
G_SCC = [
    (0, 1), (1, 2), (2, 0),          # SCC {0,1,2}
    (2, 3), (3, 4),                  # path into second cycle
    (4, 5), (5, 6), (6, 4),          # SCC {4,5,6}
    (6, 7),                          # tail (singleton)
]


def test_scc_golden(spark):
    labels, res = _run(spark, G_SCC)
    assert res.converged
    assert labels == scc_ref(G_SCC)
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[4] == labels[5] == labels[6] == 4
    assert labels[3] == 3 and labels[7] == 7


def test_scc_dag_all_singletons(spark):
    dag = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    labels, res = _run(spark, dag)
    assert labels == {v: v for v in range(8)}
    # a DAG dissolves entirely in the trim phase of round 0
    assert res.metrics[0]["active"] == 0


def test_scc_big_cycle(spark):
    n = 50
    cyc = [(i, (i + 1) % n) for i in range(n)]
    labels, _ = _run(spark, cyc)
    assert set(labels.values()) == {0}


def test_scc_rmat_matches_tarjan(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 4, seed=5)]
    edge_list = clean_edges(raw)
    labels, res = _run(spark, edge_list)
    assert res.converged
    assert labels == scc_ref(edge_list)


def test_bowtie_golden(spark):
    # in-tendril 10 -> core cycle {0,1,2} -> out 20 -> 21; 30 isolated pair
    edges = [
        (10, 0),
        (0, 1), (1, 2), (2, 0),
        (2, 20), (20, 21),
        (30, 31),
    ]
    g = EdgeTable.from_df(edges_df(spark, edges))
    parts = {r["v"]: r["part"] for r in bowtie_decomposition(g).collect()}
    assert parts == {
        0: "core", 1: "core", 2: "core",
        10: "in", 20: "out", 21: "out",
        30: "other", 31: "other",
    }


def test_bowtie_rmat_consistent_with_reach(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=9)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    scc = scc_ref(edge_list)
    # python reachability oracle
    adj: dict[int, set[int]] = {}
    radj: dict[int, set[int]] = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
        radj.setdefault(d, set()).add(s)

    def reach(seed, a):
        seen = set(seed)
        work = list(seed)
        while work:
            v = work.pop()
            for w in a.get(v, ()):
                if w not in seen:
                    seen.add(w)
                    work.append(w)
        return seen

    from collections import Counter

    sizes = Counter(scc.values())
    core_label = min(
        (l for l in sizes), key=lambda l: (-sizes[l], l)
    )
    core = {v for v, l in scc.items() if l == core_label}
    fwd = reach(core, adj)
    bwd = reach(core, radj)
    expect = {
        v: (
            "core" if v in core
            else "in" if v in bwd
            else "out" if v in fwd
            else "other"
        )
        for v in scc
    }
    parts = {r["v"]: r["part"] for r in bowtie_decomposition(g).collect()}
    assert parts == expect
