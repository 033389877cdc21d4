"""Link prediction (CN / Adamic-Adar) vs a pure-Python oracle."""

import math

import pytest

from gunrock_spark.algorithms.linkpred import (
    adamic_adar_topk,
    link_prediction_scores,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from tests.oracles import clean_edges


def aa_ref(edge_list, max_center_degree=10**9):
    """{(u,v): (cn, aa)} for non-adjacent u<v with common neighbors."""
    nbrs: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    out: dict[tuple[int, int], list] = {}
    for w, ns in nbrs.items():
        if deg[w] > max_center_degree:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                if v in nbrs.get(u, ()):  # already an edge
                    continue
                cn, aa = out.get((u, v), (0, 0.0))
                out[(u, v)] = (cn + 1, aa + 1.0 / math.log(deg[w]))
    return out


G = [
    (0, 1), (0, 2), (0, 3),      # star around 0
    (1, 2),                      # triangle 0-1-2
    (3, 4), (4, 5),
    (2, 4),
]


def _scores(spark, edge_list, **kw):
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    return {
        (r["u"], r["v"]): (r["cn"], r["aa"])
        for r in link_prediction_scores(g, **kw).collect()
    }


def test_scores_match_python_oracle_golden(spark):
    got = _scores(spark, G)
    want = aa_ref(G)
    assert set(got) == set(want)
    for p, (cn, aa) in want.items():
        assert got[p][0] == cn, p
        assert got[p][1] == pytest.approx(aa, abs=1e-12), p


def test_scores_match_python_oracle_rmat(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=31)]
    edge_list = clean_edges(raw)
    got = _scores(spark, edge_list)
    want = aa_ref(edge_list)
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0]
        assert got[p][1] == pytest.approx(want[p][1], abs=1e-9)


def test_center_degree_cap_applies(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=31)]
    edge_list = clean_edges(raw)
    got = _scores(spark, edge_list, max_center_degree=4)
    want = aa_ref(edge_list, max_center_degree=4)
    assert set(got) == set(want)
    for p in want:
        assert got[p][1] == pytest.approx(want[p][1], abs=1e-9)


def test_no_predicted_pair_is_an_edge(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=17)]
    edge_list = clean_edges(raw)
    und = {(min(s, d), max(s, d)) for s, d in edge_list}
    got = _scores(spark, edge_list)
    assert all(p not in und for p in got)
    assert all(u < v for u, v in got)


def test_topk_order_deterministic(spark):
    g = EdgeTable.from_df(edges_df(spark, G))
    top = adamic_adar_topk(g, k=3).collect()
    keys = [(-r["aa"], r["u"], r["v"]) for r in top]
    assert keys == sorted(keys)
    assert len(top) <= 3


def ext_ref(edge_list):
    """{(u,v): (ra, jaccard, pa)} for the same candidate pairs as
    aa_ref (full degrees, no cap)."""
    nbrs: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    out = {}
    for (u, v), (cn, _) in aa_ref(edge_list).items():
        common = nbrs[u] & nbrs[v]
        ra = sum(1.0 / deg[w] for w in common)
        jac = cn / (deg[u] + deg[v] - cn)
        out[(u, v)] = (ra, jac, deg[u] * deg[v])
    return out


def test_extended_scores_match_python_oracle(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=31)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = {
        (r["u"], r["v"]): (r["ra"], r["jaccard"], r["pa"])
        for r in link_prediction_scores(g).collect()
    }
    want = ext_ref(edge_list)
    assert set(got) == set(want)
    for p, (ra, jac, pa) in want.items():
        assert got[p][0] == pytest.approx(ra, abs=1e-9), p
        assert got[p][1] == pytest.approx(jac, abs=1e-9), p
        assert got[p][2] == pa, p


def test_linkpred_topk_by_jaccard(spark):
    from gunrock_spark.algorithms.linkpred import link_prediction_topk

    g = EdgeTable.from_df(edges_df(spark, G))
    top = link_prediction_topk(g, k=4, by="jaccard").collect()
    keys = [(-r["jaccard"], r["u"], r["v"]) for r in top]
    assert keys == sorted(keys)
    assert {c for c in top[0].asDict()} == {
        "u", "v", "cn", "aa", "ra", "jaccard", "pa",
    }
    with pytest.raises(ValueError):
        link_prediction_topk(g, by="nope")


# --- co-citation / bibliographic coupling (directed) -----------------------


def _pair_ref(edge_list, pivot="src", cap=10**9):
    """{(u,v): count} over the directed graph: pivot='src' groups by
    citing page (co-citation), pivot='dst' by cited target
    (bibliographic coupling); cap prunes pivot fan-out."""
    group: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        if pivot == "src":
            group.setdefault(s, set()).add(d)
        else:
            group.setdefault(d, set()).add(s)
    out: dict[tuple[int, int], int] = {}
    for _, members in group.items():
        if len(members) > cap:
            continue
        ms = sorted(members)
        for i, u in enumerate(ms):
            for v in ms[i + 1 :]:
                out[(u, v)] = out.get((u, v), 0) + 1
    return out


DG = [
    (10, 1), (10, 2), (10, 3),    # 10 co-cites {1,2,3}
    (11, 1), (11, 2),             # 11 co-cites {1,2} -> (1,2) count 2
    (12, 2), (12, 3),
    (1, 20), (2, 20), (1, 21), (2, 21),  # 1,2 couple via {20,21}
    (3, 20),
]


def test_cocitation_matches_python(spark):
    from gunrock_spark.algorithms.linkpred import cocitation_topk

    g = EdgeTable.from_df(spark.createDataFrame(DG, "src long, dst long"))
    got = {(r.u, r.v): r.cocite for r in cocitation_topk(g, k=100).collect()}
    # dedup: the cleaned edge table collapses duplicate (src,dst)
    assert got == _pair_ref(sorted(set(DG)), pivot="src")
    assert got[(1, 2)] == 2


def test_bibcoupling_matches_python(spark):
    from gunrock_spark.algorithms.linkpred import bibliographic_coupling_topk

    g = EdgeTable.from_df(spark.createDataFrame(DG, "src long, dst long"))
    got = {
        (r.u, r.v): r.coupling
        for r in bibliographic_coupling_topk(g, k=100).collect()
    }
    assert got == _pair_ref(sorted(set(DG)), pivot="dst")
    assert got[(1, 2)] == 2


def test_cocitation_fanout_cap_is_contractual(spark):
    from gunrock_spark.algorithms.linkpred import cocitation_topk

    g = EdgeTable.from_df(spark.createDataFrame(DG, "src long, dst long"))
    got = {(r.u, r.v): r.cocite for r in cocitation_topk(g, k=100, max_fanout=2).collect()}
    assert got == _pair_ref(sorted(set(DG)), pivot="src", cap=2)
    # page 10 (fan-out 3) no longer contributes
    assert got.get((1, 3)) is None


def test_cocitation_topk_order_deterministic(spark):
    from gunrock_spark.algorithms.linkpred import cocitation_topk

    g = EdgeTable.from_df(spark.createDataFrame(DG, "src long, dst long"))
    rows = cocitation_topk(g, k=3).collect()
    keys = [(r.cocite, r.u, r.v) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


def test_cocitation_rmat_matches_python(spark):
    edges = [(int(s), int(d)) for s, d in rmat_edges(scale=7, edge_factor=4, seed=11)]
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    clean = sorted(set((s, d) for s, d in edges if s != d))
    from gunrock_spark.algorithms.linkpred import cocitation_topk

    got = {(r.u, r.v): r.cocite for r in cocitation_topk(g, k=10**6, max_fanout=64).collect()}
    assert got == _pair_ref(clean, pivot="src", cap=64)
