"""HITS / SALSA / WTF / TopK against numpy oracles transcribed from
the reference functors + CPU checks (SURVEY.md §2.2, §5)."""

import numpy as np
import pytest

from gunrock_spark.algorithms.hits import hits
from gunrock_spark.algorithms.salsa import salsa
from gunrock_spark.algorithms.topk import degree_topk
from gunrock_spark.algorithms.wtf import who_to_follow
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_PR4, G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges, hits_ref, salsa_ref, wtf_ref


def _graph(spark, edge_list):
    return EdgeTable.from_df(edges_df(spark, edge_list))


def _n(edge_list):
    return max(max(e) for e in edge_list) + 1


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7], ids=["pr4", "toy7"])
def test_hits_matches_reference_functors(spark, edge_list):
    res = hits(_graph(spark, edge_list), src=0, delta=0.85, max_iter=7)
    got = {r["v"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    hub, auth = hits_ref(edge_list, src=0, delta=0.85, max_iter=7)
    for v in range(_n(edge_list)):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)


def test_hits_rmat(spark):
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(6, 8, seed=11)])
    res = hits(_graph(spark, edge_list), src=3, max_iter=5)
    got = {r["v"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    hub, auth = hits_ref(edge_list, src=3, max_iter=5)
    for v in got:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-10)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-10)


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7], ids=["pr4", "toy7"])
def test_salsa_matches_reference_functors(spark, edge_list):
    res = salsa(_graph(spark, edge_list), max_iter=4)
    got = {r["v"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    hub, auth = salsa_ref(edge_list, max_iter=4)
    for v in range(_n(edge_list)):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)


@pytest.mark.parametrize("edge_list", [G_PR4, G_TOY7], ids=["pr4", "toy7"])
def test_wtf_refscores(spark, edge_list):
    got_df = who_to_follow(_graph(spark, edge_list), src=0, alpha=0.2)
    got = {r["v"]: r["refscore"] for r in got_df.collect()}
    ref = wtf_ref(edge_list, src=0, alpha=0.2)
    for v in range(_n(edge_list)):
        assert got.get(v, 0.0) == pytest.approx(ref[v], abs=1e-9)


def test_wtf_small_cot(spark):
    # cot smaller than n exercises the top-k cut
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(5, 8, seed=13)])
    got_df = who_to_follow(_graph(spark, edge_list), src=1, alpha=0.25, cot_size=8)
    got = {r["v"]: r["refscore"] for r in got_df.collect()}
    ref = wtf_ref(edge_list, src=1, alpha=0.25, cot_size=8)
    for v in got:
        assert got[v] == pytest.approx(ref[v], abs=1e-9)


def test_degree_topk(spark):
    g = _graph(spark, G_TOY7)
    rows = degree_topk(g, k=3).collect()
    # recompute degrees in python
    deg = {}
    for s, d in clean_edges(G_TOY7):
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    want = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["v"], r["degree"]) for r in rows] == want
