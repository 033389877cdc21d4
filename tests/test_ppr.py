"""Forward-push personalized PageRank + sweep cut (algorithms/ppr.py)."""

import math

import pytest

from gunrock_spark.algorithms.ppr import ppr_push, ppr_scores, sweep_cut
from gunrock_spark.graph.edge_table import EdgeTable


def _graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return EdgeTable.from_df(df)


def _python_push(edges, seeds, alpha, eps, rounds):
    """Pure-python replica of the synchronous batched push schedule."""
    out = {}
    deg = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
        deg[s] = deg.get(s, 0) + 1
    p = {}
    r = {v: 1.0 / len(seeds) for v in seeds}
    for _ in range(rounds):
        frontier = [v for v, rv in r.items() if rv > eps * max(deg.get(v, 0), 1)]
        if not frontier:
            break
        new_r = {v: rv for v, rv in r.items()}
        for v in frontier:
            rv = r[v]
            p[v] = p.get(v, 0.0) + alpha * rv
            new_r[v] = new_r.get(v, 0.0) - rv
            d = deg.get(v, 0)
            if d:
                share = (1.0 - alpha) * rv / d
                for u in out[v]:
                    new_r[u] = new_r.get(u, 0.0) + share
        r = new_r
    return p, r


EDGES = [
    # two communities bridged by one edge (undirected-ish by listing both)
    (0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0),
    (2, 3), (3, 2),
    (3, 4), (4, 3), (4, 5), (5, 4), (3, 5), (5, 3),
]


def test_push_matches_python_oracle(spark):
    g = _graph(spark, EDGES)
    alpha, eps = 0.15, 1e-3
    res = ppr_push(g, [0], alpha=alpha, eps=eps, max_iter=8)
    got = {row.v: (row.p, row.r) for row in res.state.collect()}
    exp_p, exp_r = _python_push(EDGES, [0], alpha, eps, res.iterations)
    for v, (pv, rv) in got.items():
        assert pv == pytest.approx(exp_p.get(v, 0.0), abs=1e-12)
        assert rv == pytest.approx(exp_r.get(v, 0.0), abs=1e-12)


def test_push_mass_conservation_and_locality(spark):
    # seed's community holds almost all mass; p+r never exceeds 1
    g = _graph(spark, EDGES)
    res = ppr_push(g, [0], alpha=0.2, eps=1e-6, max_iter=60)
    rows = res.state.collect()
    total = sum(row.p + row.r for row in rows)
    assert total <= 1.0 + 1e-12
    mass = {row.v: row.p for row in rows}
    left = mass.get(0, 0) + mass.get(1, 0) + mass.get(2, 0)
    right = mass.get(3, 0) + mass.get(4, 0) + mass.get(5, 0)
    assert left > 3 * right


def test_push_converged_residuals_below_threshold(spark):
    g = _graph(spark, EDGES)
    eps = 1e-5
    res = ppr_push(g, [0], alpha=0.15, eps=eps, max_iter=200)
    assert res.converged
    deg = {r.v: r.out_degree for r in g.degrees.collect()}
    for row in res.state.collect():
        assert row.r <= eps * max(deg.get(row.v, 0), 1) + 1e-15


def test_dangling_frontier_leaks_mass_but_keeps_p(spark):
    # 0 -> 9, 9 dangling: 9's residual converts alpha-fraction to p
    g = _graph(spark, [(0, 9), (1, 0)])
    res = ppr_push(g, [9], alpha=0.25, eps=1e-9, max_iter=5)
    got = {row.v: (row.p, row.r) for row in res.state.collect()}
    assert got[9][0] == pytest.approx(0.25)
    assert got[9][1] == pytest.approx(0.0)
    # the (1-alpha) remainder left the system entirely
    assert sum(p + r for p, r in got.values()) == pytest.approx(0.25)


def test_multi_seed_split(spark):
    g = _graph(spark, EDGES)
    res = ppr_push(g, [0, 3], alpha=0.15, eps=1e-3, max_iter=1)
    got = {row.v: row.p for row in res.state.collect()}
    # one round: each seed converts alpha * 1/2
    assert got[0] == pytest.approx(0.075)
    assert got[3] == pytest.approx(0.075)


def test_sweep_cut_finds_planted_community(spark):
    g = _graph(spark, EDGES).symmetrized()
    res = ppr_push(g, [0], alpha=0.15, eps=1e-6, max_iter=60)
    sweep = sweep_cut(g, res.state.select("v", "p"), k=6).collect()
    by_rank = {row.rank: (row.v, row.phi) for row in sweep}
    # whole-graph prefix has no outside volume: phi is NULL there
    assert by_rank[6][1] is None
    # best conductance prefix is the planted triangle {0,1,2}
    defined = {k: v for k, v in by_rank.items() if v[1] is not None}
    best_rank = min(defined, key=lambda k: (defined[k][1], k))
    assert best_rank == 3
    assert {by_rank[r][0] for r in (1, 2, 3)} == {0, 1, 2}
    # phi of the triangle: cut=1 (the 2-3 bridge), vol=2+2+3=7
    assert by_rank[3][1] == pytest.approx(round(1 / 7, 6))


def test_sweep_cut_python_oracle(spark):
    g = _graph(spark, EDGES).symmetrized()
    res = ppr_push(g, [0], alpha=0.15, eps=1e-6, max_iter=60)
    k = 6
    got = {row.rank: row.phi for row in sweep_cut(g, res.state.select("v", "p"), k=k).collect()}

    sym = {(r.src, r.dst) for r in g.edges.collect()}
    deg = {r.v: r.out_degree for r in g.degrees.collect()}
    p = {r.v: r.p for r in res.state.collect()}
    order = sorted(
        (v for v in p if deg.get(v, 0) > 0),
        key=lambda v: (-round(p[v] / deg[v], 9), v),
    )[:k]
    two_m = len(sym)
    prefix = set()
    for i, v in enumerate(order, start=1):
        prefix.add(v)
        vol = sum(deg[u] for u in prefix)
        internal = sum(1 for (a, b) in sym if a in prefix and b in prefix)
        denom = min(vol, two_m - vol)
        phi = round((vol - internal) / denom, 6) if denom else None
        assert got[i] == pytest.approx(phi) if phi is not None else got[i] is None


def test_push_rejects_bad_args(spark):
    g = _graph(spark, EDGES)
    with pytest.raises(ValueError):
        ppr_push(g, [])
    with pytest.raises(ValueError):
        ppr_push(g, [0], alpha=1.5)


def test_scores_rounding(spark):
    g = _graph(spark, EDGES)
    res = ppr_push(g, [0], alpha=0.15, eps=1e-3, max_iter=4)
    out = ppr_scores(res.state, decimals=6).collect()
    for row in out:
        assert row.p == round(row.p, 6) and row.r == round(row.r, 6)
