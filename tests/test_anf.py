"""HyperANF vs a pure-Python exact-BFS + replicated-HLL oracle."""

import math

import pytest

from gunrock_spark.algorithms.anf import (
    anf_registers,
    ball_estimates,
    effective_diameter,
    neighborhood_function,
)
from gunrock_spark.functions.hashing import h60_py
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from tests.oracles import clean_edges

M = 16
CAP = 50
ALPHA16 = 0.673


def registers_py(ids, m=M, seed="anf"):
    """{j: rho} — the HLL register replica of anf.vertex_registers."""
    regs: dict[int, int] = {}
    b = m.bit_length() - 1
    for x in ids:
        h = h60_py(f"{seed}:{x}")
        j = h & (m - 1)
        rem = h >> b
        rho = CAP if rem == 0 else min((rem & -rem).bit_length(), CAP)
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def est_py(regs, m=M):
    """Replica of anf.ball_estimates for one register dict."""
    s = sum(1 << (CAP - rho) for rho in regs.values())
    s += (m - len(regs)) * (1 << CAP)
    zeros = m - len(regs)
    raw = ALPHA16 * m * m * float(1 << CAP) / s
    if zeros > 0 and raw <= 2.5 * m:
        val = float(m) * math.log(float(m) / zeros)
    else:
        val = raw
    return int(math.floor(val + 0.5))  # HALF_UP like Spark/DuckDB ROUND


def balls_py(edge_list, radius):
    """{v: set of vertices reachable within radius} by exact BFS."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    out = {}
    for v in verts:
        seen = {v}
        frontier = {v}
        for _ in range(radius):
            nxt = set()
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        nxt.add(w)
            if not nxt:
                break
            frontier = nxt
        out[v] = seen
    return out


def oracle_ball_ests(edge_list, radius):
    return {
        v: est_py(registers_py(ball))
        for v, ball in balls_py(edge_list, radius).items()
    }


G = [
    (0, 1), (1, 2), (2, 0),       # 3-cycle
    (2, 3), (3, 4), (4, 5),       # tail path
    (5, 3),                       # back edge -> second cycle {3,4,5}
    (0, 6),                       # branch
]


def test_ball_estimates_match_python_oracle(spark):
    g = EdgeTable.from_df(edges_df(spark, G))
    for radius in (0, 1, 2, 3):
        res = anf_registers(g, radius=radius, early_stop=False)
        got = {
            r["v"]: r["ball_est"]
            for r in ball_estimates(res.state).collect()
        }
        assert got == oracle_ball_ests(G, radius), f"radius {radius}"


def test_anf_rmat_matches_python_oracle(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=13)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = anf_registers(g, radius=3, early_stop=False)
    got = {r["v"]: r["ball_est"] for r in ball_estimates(res.state).collect()}
    assert got == oracle_ball_ests(edge_list, 3)


def test_registers_converge_and_early_stop(spark):
    # diameter-2 closure: converges well before radius 10
    g = EdgeTable.from_df(edges_df(spark, G))
    res = anf_registers(g, radius=10)
    assert res.converged
    assert res.iterations < 10
    # metrics carry the monotone pair-count estimates
    ns = [m["n_pairs_est"] for m in res.metrics]
    assert ns == sorted(ns)


def test_neighborhood_function_fixed_rows_and_monotone(spark):
    g = EdgeTable.from_df(edges_df(spark, G))
    nf = neighborhood_function(g, max_radius=6)
    rows = sorted((r["t"], r["n_pairs_est"]) for r in nf.collect())
    assert [t for t, _ in rows] == list(range(7))
    vals = [n for _, n in rows]
    assert vals == sorted(vals)
    # saturated tail repeats the converged value
    assert vals[-1] == vals[-2]
    # N(t) sums the python oracle per radius
    for t, n in rows[:4]:
        assert n == sum(oracle_ball_ests(G, t).values())


def in_balls_py(edge_list, radius):
    """{v: set of u with dist(u, v) <= radius} — incoming balls."""
    return balls_py([(d, s) for s, d in edge_list], radius)


def hyperball_py(edge_list, radius):
    """{v: (harmonic, sum_dist)} replicating hyperball_centralities."""
    verts = {x for e in edge_list for x in e}
    prev = {v: est_py(registers_py({v})) for v in verts}
    harm = {v: 0.0 for v in verts}
    sdist = {v: 0 for v in verts}
    for t in range(1, radius + 1):
        cur = {
            v: est_py(registers_py(ball))
            for v, ball in in_balls_py(edge_list, t).items()
        }
        for v in verts:
            d = cur[v] - prev[v]
            harm[v] = harm[v] + float(d) / float(t)
            sdist[v] = sdist[v] + t * d
        prev = cur
    return {v: (harm[v], sdist[v]) for v in verts}


def test_hyperball_centralities_match_python_oracle(spark):
    from gunrock_spark.algorithms.anf import hyperball_centralities

    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=21)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = {
        r["v"]: (r["harmonic"], r["sum_dist"])
        for r in hyperball_centralities(g, radius=3).collect()
    }
    want = hyperball_py(edge_list, 3)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12), v
        assert got[v][1] == want[v][1], v


def test_effective_diameter_interpolation():
    # synthetic exact nf: saturates at 100 pairs by t=4
    nf = [(0, 10), (1, 40), (2, 80), (3, 95), (4, 100)]
    d = effective_diameter(nf, alpha=0.9)
    # target 90 lies between t=2 (80) and t=3 (95): 2 + 10/15
    assert d == pytest.approx(2 + 10 / 15)
    assert effective_diameter(nf, alpha=0.05) == 0.0
    assert effective_diameter([(0, 7)]) == 0.0


def test_effective_diameter_on_real_nf(spark):
    g = EdgeTable.from_df(edges_df(spark, G))
    nf = neighborhood_function(g, max_radius=8)
    d = effective_diameter(nf)
    assert 0.0 <= d <= 8.0


def test_closeness_centralities_match_python_oracle(spark):
    from gunrock_spark.algorithms.anf import closeness_centralities

    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=21)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = {
        r["v"]: (r["closeness"], r["lin"], r["sum_dist"])
        for r in closeness_centralities(g, radius=3).collect()
    }
    # expected from the hyperball replica plus the final ball size
    verts = {x for e in edge_list for x in e}
    balls3 = {
        v: est_py(registers_py(ball))
        for v, ball in in_balls_py(edge_list, 3).items()
    }
    hb = hyperball_py(edge_list, 3)
    assert set(got) == set(verts)
    for v in verts:
        sdist = hb[v][1]
        r = balls3[v] - 1
        if sdist > 0:
            want_c, want_l = float(r) / sdist, float(r * r) / sdist
        else:
            want_c, want_l = 0.0, 1.0
        assert got[v][0] == pytest.approx(want_c, abs=1e-12), v
        assert got[v][1] == pytest.approx(want_l, abs=1e-12), v
        assert got[v][2] == sdist, v


def test_closeness_isolated_conventions(spark):
    # 0 -> 1: vertex 0 has an empty in-ball (sum_dist 0) ->
    # closeness 0, lin 1 (the Boldi-Vigna convention).
    from gunrock_spark.algorithms.anf import closeness_centralities

    g = EdgeTable.from_df(edges_df(spark, [(0, 1)]))
    got = {r["v"]: r for r in closeness_centralities(g, radius=2).collect()}
    assert got[0]["closeness"] == 0.0 and got[0]["lin"] == 1.0
    assert got[0]["sum_dist"] == 0
    assert got[1]["closeness"] > 0.0


def test_distance_histogram_matches_nf_differences(spark):
    from gunrock_spark.algorithms.anf import distance_histogram

    g = EdgeTable.from_df(edges_df(spark, G))
    nf = neighborhood_function(g, max_radius=4)
    nf_rows = dict((r["t"], r["n_pairs_est"]) for r in nf.collect())
    got = {
        r["t"]: r["n_pairs_at_t"]
        for r in distance_histogram(nf).collect()
    }
    want = {
        t: nf_rows[t] - nf_rows.get(t - 1, 0) for t in nf_rows
    }
    assert got == want
    # t=0 bucket is N(0) itself; buckets are nonnegative (N monotone)
    assert got[0] == nf_rows[0]
    assert all(x >= 0 for x in got.values())


def test_effective_diameter_df_matches_scalar(spark):
    from gunrock_spark.algorithms.anf import effective_diameter_df

    for seed in (13, 21):
        raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=seed)]
        edge_list = clean_edges(raw)
        g = EdgeTable.from_df(edges_df(spark, edge_list))
        nf = neighborhood_function(g, max_radius=5)
        want = effective_diameter(nf, alpha=0.9)
        row = effective_diameter_df(nf, alpha=0.9).collect()
        assert len(row) == 1
        assert row[0]["alpha"] == 0.9
        assert row[0]["eff_diameter"] == pytest.approx(want, abs=5e-7)


def test_effective_diameter_df_saturated_at_zero(spark):
    # single edge 0 -> 1: N(0)=2, N(t)=3 for t>=1; target=2.7 ->
    # interpolation between t=0 and t=1 at (2.7-2)/(3-2)=0.7
    from gunrock_spark.algorithms.anf import effective_diameter_df

    g = EdgeTable.from_df(edges_df(spark, [(0, 1)]))
    nf = neighborhood_function(g, max_radius=3)
    want = effective_diameter(nf, alpha=0.9)
    got = effective_diameter_df(nf, alpha=0.9).collect()[0]["eff_diameter"]
    assert got == pytest.approx(want, abs=5e-7)
