"""Widest-path (bottleneck) capacities vs a pure-Python max-min
Dijkstra oracle."""

import heapq
import random

import pytest

from gunrock_spark.algorithms.sssp import CAP_INF, widest_paths
from gunrock_spark.graph.edge_table import EdgeTable


def widest_py(wedges, source):
    """Max-min Dijkstra: pop the highest-capacity vertex first."""
    adj: dict[int, list[tuple[int, int]]] = {}
    verts = set()
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, w))
        verts.update((s, d))
    cap = {source: CAP_INF}
    heap = [(-CAP_INF, source)]
    done = set()
    while heap:
        negc, u = heapq.heappop(heap)
        if u in done:
            continue
        done.add(u)
        for d, w in adj.get(u, ()):
            nc = min(-negc, w)
            if nc > cap.get(d, 0):
                cap[d] = nc
                heapq.heappush(heap, (-nc, d))
    return cap


def _wgraph(spark, wedges):
    return EdgeTable.from_df(
        spark.createDataFrame(
            [(s, d, float(w)) for s, d, w in wedges],
            "src long, dst long, weight double",
        ),
        weight="weight",
    )


def test_widest_paths_match_python_oracle(spark):
    rng = random.Random(7)
    es = {(rng.randrange(50), rng.randrange(50)) for _ in range(260)}
    wedges = [(s, d, rng.randrange(1, 20)) for s, d in sorted(es) if s != d]
    g = _wgraph(spark, wedges)
    src = min(x for e in wedges for x in e[:2])
    res = widest_paths(g, source=src)
    got = {r["v"]: r["cap"] for r in res.state.where("cap > 0").collect()}
    assert got == widest_py(wedges, src)
    assert res.converged


def test_widest_paths_bottleneck_semantics(spark):
    # 0 -> 1 -> 3 with min weight 2; 0 -> 2 -> 3 with min weight 5:
    # the wide route wins even though both reach 3
    wedges = [(0, 1, 9), (1, 3, 2), (0, 2, 5), (2, 3, 7)]
    g = _wgraph(spark, wedges)
    res = widest_paths(g, source=0)
    got = {r["v"]: r["cap"] for r in res.state.collect()}
    assert got[3] == 5 and got[1] == 9 and got[2] == 5
    assert got[0] == CAP_INF


def test_widest_paths_requires_weights(spark):
    g = EdgeTable.from_df(
        spark.createDataFrame([(0, 1)], "src long, dst long")
    )
    with pytest.raises(ValueError):
        widest_paths(g, source=0)
