"""Independent-cascade spread vs a pure-Python live-edge BFS oracle."""

from collections import deque

from gunrock_spark.algorithms.influence import IC_COIN_MOD, ic_spread, live_edges
from gunrock_spark.functions.hashing import h60_py
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from tests.oracles import clean_edges


def coin_py(s, d, seed="ic"):
    return h60_py(f"{seed}:{s}:{d}") % IC_COIN_MOD


def live_py(edge_list, p_milli, seed="ic"):
    return [(s, d) for s, d in edge_list if coin_py(s, d, seed) < p_milli]


def spread_py(edge_list, seeds, p_milli, seed="ic"):
    """{v: activation round} — multi-source BFS over the live edges."""
    adj: dict[int, list[int]] = {}
    for s, d in live_py(edge_list, p_milli, seed):
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _seeds_df(spark, vs):
    return spark.createDataFrame([(int(v),) for v in vs], "source long")


def test_ic_spread_matches_python_oracle(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 4, seed=5)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    seeds = sorted({s for s, _ in edge_list})[:3]
    res = ic_spread(g, _seeds_df(g.edges.sparkSession, seeds), p_milli=400)
    got = {r["v"]: r["round"] for r in res.state.collect()}
    assert got == spread_py(edge_list, seeds, 400)
    assert res.converged


def test_ic_spread_p_zero_activates_only_seeds(spark):
    edge_list = [(0, 1), (1, 2), (2, 3)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = ic_spread(g, _seeds_df(spark, [0, 2]), p_milli=0)
    got = {r["v"]: r["round"] for r in res.state.collect()}
    assert got == {0: 0, 2: 0}


def test_ic_spread_p_full_is_plain_bfs(spark):
    edge_list = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = ic_spread(g, _seeds_df(spark, [0]), p_milli=IC_COIN_MOD)
    got = {r["v"]: r["round"] for r in res.state.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}


def test_live_edges_deterministic_and_monotone_in_p(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 4, seed=9)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    small = {(r["src"], r["dst"]) for r in live_edges(g, 200).collect()}
    big = {(r["src"], r["dst"]) for r in live_edges(g, 600).collect()}
    assert small == {e for e in edge_list if coin_py(*e) < 200}
    assert big == {e for e in edge_list if coin_py(*e) < 600}
    # nested coin thresholds -> nested live subgraphs
    assert small <= big


def test_ic_spread_round_cap_truncates(spark):
    edge_list = [(i, i + 1) for i in range(6)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    res = ic_spread(g, _seeds_df(spark, [0]), p_milli=IC_COIN_MOD, max_rounds=2)
    got = {r["v"]: r["round"] for r in res.state.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert not res.converged


def cc_giant_py(edge_list):
    """Size of the largest weakly connected component."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edge_list:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    from collections import Counter

    if not parent:
        return 0
    return max(Counter(find(x) for x in parent).values())


def test_percolation_curve_matches_python_oracle(spark):
    from gunrock_spark.algorithms.influence import percolation_curve

    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 6, seed=3)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    ps = (0, 250, 700, 1000)
    got = {
        r["p_milli"]: (r["n_live_edges"], r["giant_size"])
        for r in percolation_curve(g, p_millis=ps).collect()
    }
    for p in ps:
        live = live_py(edge_list, p)
        assert got[p] == (len(live), cc_giant_py(live)), p
    # nested coins -> live sets nest -> both readouts monotone in p
    ns = [got[p][0] for p in ps]
    gs = [got[p][1] for p in ps]
    assert ns == sorted(ns) and gs == sorted(gs)
    # p=1000 keeps everything
    assert got[1000] == (len(edge_list), cc_giant_py(edge_list))


def degree_discount_py(edge_list, k, p_milli):
    """Replica of influence.degree_discount_seeds (undirected,
    integer-scaled scores, ties by smallest v)."""
    nbrs: dict[int, set] = {}
    for s, d in edge_list:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    t = {v: 0 for v in deg}
    picked = []
    for _ in range(k):
        if not t:
            break
        best = min(
            t,
            key=lambda v: (
                -(1000 * (deg[v] - 2 * t[v]) - (deg[v] - t[v]) * t[v] * p_milli),
                v,
            ),
        )
        picked.append(best)
        del t[best]
        for w in nbrs[best]:
            if w in t:
                t[w] += 1
    return picked


def test_degree_discount_matches_python_oracle(spark):
    from gunrock_spark.algorithms.influence import degree_discount_seeds

    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 6, seed=11)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = [
        r["seed"]
        for r in degree_discount_seeds(g, k=5, p_milli=300)
        .orderBy("rank")
        .collect()
    ]
    assert got == degree_discount_py(edge_list, 5, 300)


def test_degree_discount_star_picks_hub_then_spreads(spark):
    # star 0-{1..5} plus pendant 5-6: hub first; after the hub every
    # leaf is discounted, the pendant-adjacent leaf wins only if its
    # discounted score says so — replicate with the python oracle.
    edge_list = [(0, i) for i in range(1, 6)] + [(5, 6)]
    from gunrock_spark.algorithms.influence import degree_discount_seeds

    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = [
        r["seed"]
        for r in degree_discount_seeds(g, k=3, p_milli=500)
        .orderBy("rank")
        .collect()
    ]
    assert got[0] == 0
    assert got == degree_discount_py(edge_list, 3, 500)


def test_attack_curve_matches_python_oracle(spark):
    from collections import Counter

    from gunrock_spark.algorithms.influence import attack_curve

    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 6, seed=29)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    ks = (0, 2, 8)
    got = {
        r["k"]: (r["n_live_edges"], r["giant_size"])
        for r in attack_curve(g, ks=ks).collect()
    }
    nbrs: dict[int, set] = {}
    for s, d in edge_list:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    order = sorted(nbrs, key=lambda v: (-len(nbrs[v]), v))
    for k in ks:
        hubs = set(order[:k])
        live = [(s, d) for s, d in edge_list if s not in hubs and d not in hubs]
        assert got[k] == (len(live), cc_giant_py(live)), k
    # removing hubs can only shrink both readouts
    ns = [got[k][0] for k in ks]
    gs = [got[k][1] for k in ks]
    assert ns == sorted(ns, reverse=True) and gs == sorted(gs, reverse=True)
