"""Maximal matching vs a pure-Python replica + matching invariants."""

import hashlib

import pytest

from gunrock_spark.algorithms.matching import maximal_matching
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_PR4, G_TOY7, edges_df, rmat_edges


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_matching(edges):
    alive = sorted(
        {(min(s, d), max(s, d)) for s, d in edges if s != d}
    )
    key = {e: (_h60(f"{e[0]}:{e[1]}"), e[0], e[1]) for e in alive}
    matched = []
    while alive:
        vmin = {}
        for e in alive:
            for v in e:
                if v not in vmin or key[e] < vmin[v]:
                    vmin[v] = key[e]
        dominant = [e for e in alive if vmin[e[0]] == key[e] and vmin[e[1]] == key[e]]
        matched.extend(dominant)
        dead = {v for e in dominant for v in e}
        alive = [e for e in alive if e[0] not in dead and e[1] not in dead]
    return sorted(matched)


def _run(spark, edge_list):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = maximal_matching(g)
    return g, res, sorted((r["a"], r["b"]) for r in res.state.collect())


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7])
def test_matching_matches_python(spark, edge_list):
    _, res, got = _run(spark, edge_list)
    assert got == _py_matching(edge_list)
    assert res.converged


def test_matching_rmat_invariants_and_python_equality(spark):
    edge_list = [(int(s), int(d)) for s, d in rmat_edges(scale=7, edge_factor=4, seed=11)]
    g, res, got = _run(spark, edge_list)
    assert got == _py_matching(edge_list)
    # independence: no vertex appears twice
    verts = [v for e in got for v in e]
    assert len(verts) == len(set(verts))
    # maximality: every simple undirected edge touches a matched vertex
    vset = set(verts)
    simple = {(min(s, d), max(s, d)) for s, d in edge_list if s != d}
    assert all(a in vset or b in vset for a, b in simple)


def test_matching_deterministic(spark):
    edge_list = [(int(s), int(d)) for s, d in rmat_edges(scale=6, edge_factor=4, seed=5)]
    _, _, got1 = _run(spark, edge_list)
    _, _, got2 = _run(spark, edge_list)
    assert got1 == got2


def test_matching_empty_graph(spark):
    # all self-loops -> no canonical edges -> empty matching, 0 rounds
    g = EdgeTable.from_df(edges_df(spark, [(1, 1), (2, 2)]))
    res = maximal_matching(g)
    assert res.state.count() == 0
