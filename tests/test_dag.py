"""DAG longest-path layering (algorithms/dag.py) vs pure-Python
longest-path, plus the capped-round = paths-of-length<=K property the
driver oracle relies on."""

from __future__ import annotations

import random

from gunrock_spark.algorithms.dag import dag_levels
from gunrock_spark.graph.edge_table import EdgeTable


def _rand_dag(n=60, m=240, seed=3):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))  # src < dst => acyclic
    return sorted(es)


def _py_levels(edges, cap=None):
    """SYNCHRONOUS (Jacobi) rounds — each round reads only the previous
    round's levels, matching the engine; after K rounds level(v) is the
    longest path of length <= K ending at v."""
    verts = sorted({v for e in edges for v in e})
    lev = {v: 0 for v in verts}
    for _ in range(cap if cap is not None else len(verts)):
        new = dict(lev)
        for s, d in edges:
            if lev[s] + 1 > new[d]:
                new[d] = lev[s] + 1
        if new == lev:
            break
        lev = new
    return lev


def test_dag_levels_match_python_longest_path(spark):
    edges = _rand_dag()
    df = spark.createDataFrame(edges, "src long, dst long")
    res = dag_levels(df)
    got = {r.v: r.level for r in res.state.collect()}
    assert got == _py_levels(edges)
    assert res.iterations <= max(got.values()) + 2


def test_dag_levels_capped_rounds_are_bounded_paths(spark):
    """After K rounds level(v) = longest path of length <= K — the
    Bellman-Ford-max prefix property the driver oracle unrolls."""
    edges = _rand_dag(n=40, m=160, seed=9)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.level for r in dag_levels(df, max_iter=3).state.collect()}
    assert got == _py_levels(edges, cap=3)
    # the cap binds on this input (otherwise the test is vacuous)
    assert got != _py_levels(edges)


def test_dag_levels_accepts_edge_table_and_chain(spark):
    g = EdgeTable.from_df(
        spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long")
    )
    got = {r.v: r.level for r in dag_levels(g).state.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
