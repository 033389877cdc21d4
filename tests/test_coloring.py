"""Graph coloring (JP-mex + minmax parity) vs pure-Python oracles."""

from gunrock_spark.algorithms.coloring import greedy_coloring, minmax_coloring
from gunrock_spark.functions.hashing import h60_py
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from tests.oracles import clean_edges

NO_NB = 1 << 62


def _nbrs(edge_list):
    nbrs: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    return nbrs


def jp_mex_ref(edge_list, max_rounds=100):
    """Replica of greedy_coloring: per-round h60 priorities, strict
    local minima take the mex of colored-neighbor colors."""
    nbrs = _nbrs(edge_list)
    color = {v: -1 for v in nbrs}
    for i in range(max_rounds):
        alive = [v for v, c in color.items() if c == -1]
        if not alive:
            break
        pri = {v: h60_py(f"{v}:{i}") for v in alive}
        winners = [
            v
            for v in alive
            if all(
                pri[v] < pri.get(w, NO_NB)
                for w in nbrs[v]
                if color[w] == -1
            )
        ]
        for v in winners:
            used = {color[w] for w in nbrs[v] if color[w] != -1}
            k = 0
            while k in used:
                k += 1
            color[v] = k
    return color


def minmax_ref(edge_list, max_rounds=100):
    """Replica of minmax_coloring: strict local min -> 2i, strict
    local max -> 2i+1 (min wins when both)."""
    nbrs = _nbrs(edge_list)
    color = {v: -1 for v in nbrs}
    for i in range(max_rounds):
        alive = [v for v, c in color.items() if c == -1]
        if not alive:
            break
        pri = {v: h60_py(f"{v}:{i}") for v in alive}
        assign = {}
        for v in alive:
            ps = [pri[w] for w in nbrs[v] if color[w] == -1]
            is_min = all(pri[v] < p for p in ps)
            is_max = all(pri[v] > p for p in ps)
            if is_min:
                assign[v] = 2 * i
            elif is_max:
                assign[v] = 2 * i + 1
        color.update(assign)
    return color


def _proper(edge_list, color):
    return all(
        color[s] != color[d] for s, d in edge_list if s != d
    )


def _graph(spark, edge_list):
    return EdgeTable.from_df(edges_df(spark, edge_list))


def test_jp_mex_matches_python_oracle(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=41)]
    edge_list = clean_edges(raw)
    res = greedy_coloring(_graph(spark, edge_list))
    got = {r["v"]: r["color"] for r in res.state.collect()}
    want = jp_mex_ref(edge_list)
    assert res.converged
    assert got == want
    assert _proper(edge_list, got)


def test_minmax_matches_python_oracle(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=43)]
    edge_list = clean_edges(raw)
    res = minmax_coloring(_graph(spark, edge_list))
    got = {r["v"]: r["color"] for r in res.state.collect()}
    want = minmax_ref(edge_list)
    assert res.converged
    assert got == want
    assert _proper(edge_list, got)


def test_jp_mex_uses_fewer_colors_than_minmax(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 4, seed=45)]
    edge_list = clean_edges(raw)
    g = _graph(spark, edge_list)
    n_jp = len({c for c in jp_mex_ref(edge_list).values()})
    mm = minmax_coloring(g)
    n_mm = mm.state.select("color").distinct().count()
    assert mm.iterations <= 30
    assert n_jp <= n_mm  # the documented trade-off


def test_coloring_deterministic_rerun(spark):
    edge_list = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    g = _graph(spark, edge_list)
    a = {r["v"]: r["color"] for r in minmax_coloring(g).state.collect()}
    b = {r["v"]: r["color"] for r in minmax_coloring(g).state.collect()}
    assert a == b
