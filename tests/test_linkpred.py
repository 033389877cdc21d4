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
