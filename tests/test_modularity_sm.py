"""Modularity (global_indicator/modularity.cuh) and subgraph matching
(util/join.cuh join-chain semantics) against brute-force oracles."""

import itertools

import pytest

from gunrock_spark.algorithms.label_propagation import label_propagation
from gunrock_spark.algorithms.modularity import modularity
from gunrock_spark.algorithms.subgraph_match import (
    subgraph_match,
    subgraph_match_count,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_CC11, G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges


def modularity_ref(edges, communities):
    """Q = sum over same-community edges (2m - k_i*k_j)/(4 m^2) with
    k = out-degree (modularity.cuh:50-55)."""
    m = len(edges)
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    total = sum(
        2.0 * m - outd.get(s, 0) * outd.get(d, 0)
        for s, d in edges
        if communities[s] == communities[d]
    )
    return total / (4.0 * m * m)


def sm_ref(edges, pattern):
    """Brute-force vertex-injective embeddings of a directed pattern."""
    eset = set(edges)
    verts = sorted({v for e in edges for v in e})
    qverts = sorted({v for e in pattern for v in e})
    count = 0
    for assign in itertools.permutations(verts, len(qverts)):
        mapping = dict(zip(qverts, assign))
        if all((mapping[a], mapping[b]) in eset for a, b in pattern):
            count += 1
    return count


DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3)]


def test_modularity_toy7_lp_communities(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    comm = label_propagation(g, mode="mode", max_iter=3).state
    got = modularity(g, comm.select("v", "label")).collect()[0]["modularity"]
    labels = {r["v"]: r["label"] for r in comm.collect()}
    cleaned = clean_edges(G_TOY7)
    assert got == pytest.approx(modularity_ref(cleaned, labels), abs=1e-12)


def test_modularity_all_one_community(spark):
    # every edge is intra-community: Q = sum(2m - k_i k_j)/4m^2 over all edges
    edge_list = clean_edges(G_CC11)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    comm = g.vertices.selectExpr("v", "CAST(0 AS LONG) AS label")
    got = modularity(g, comm).collect()[0]["modularity"]
    assert got == pytest.approx(
        modularity_ref(edge_list, {v: 0 for e in edge_list for v in e}), abs=1e-12
    )


def test_modularity_singletons_is_nonpositive(spark):
    # singleton communities: only self-community edges would count; none
    # exist after self-loop removal, so Q = 0
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    comm = g.vertices.selectExpr("v", "v AS label")
    got = modularity(g, comm).collect()[0]["modularity"]
    assert got == 0.0


def test_sm_diamond_golden(spark):
    # one diamond 0->1,0->2,1->3,2->3 plus a distractor edge
    edge_list = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    rows = subgraph_match(g, DIAMOND).collect()
    got = {(r["u0"], r["u1"], r["u2"], r["u3"]) for r in rows}
    # (0,1,2,3) and the mirror (0,2,1,3) — both injective embeddings
    assert got == {(0, 1, 2, 3), (0, 2, 1, 3)}


def test_sm_diamond_rmat_vs_bruteforce(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(6, 6, seed=11)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    got = subgraph_match_count(g, DIAMOND).collect()[0]["n_matches"]
    assert got == sm_ref(edge_list, DIAMOND)


def test_sm_path3_vs_bruteforce(spark):
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(5, 8, seed=3)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    path3 = [(0, 1), (1, 2), (2, 3)]
    got = subgraph_match_count(g, path3).collect()[0]["n_matches"]
    assert got == sm_ref(edge_list, path3)


def test_sm_disconnected_pattern_rejected(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    with pytest.raises(ValueError):
        subgraph_match(g, [(0, 1), (2, 3)])


def test_sm_undirected_triangle_matches_6x_triangles(spark):
    # each undirected triangle has 6 injective embeddings of the
    # directed 3-cycle over the symmetrized view
    from gunrock_spark.algorithms.triangles import triangle_count

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    cyc = [(0, 1), (1, 2), (2, 0)]
    got = subgraph_match_count(g, cyc, undirected=True).collect()[0]["n_matches"]
    assert got == 6 * triangle_count(g)


# ---------------------------------------------------------------------------
# conductance
# ---------------------------------------------------------------------------


def conductance_ref(edges, communities):
    """phi(S) = cut(S)/min(vol(S), vol(V)-vol(S)) over the undirected
    (symmetrized, deduped) view; vol from symmetrized degrees."""
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    total_vol = len(sym)
    out = {}
    for label in set(communities.values()):
        members = {v for v, l in communities.items() if l == label}
        vol = sum(deg.get(v, 0) for v in members)
        cut = sum(1 for s, d in sym if s in members and d not in members)
        side = min(vol, total_vol - vol)
        phi = 0.0 if side <= 0 else cut / side
        out[label] = (len(members), vol, cut, phi)
    return out


def test_conductance_toy7_lp_communities(spark):
    from gunrock_spark.algorithms.modularity import conductance

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    comm = label_propagation(g, mode="mode", max_iter=3).state
    got = {
        r["label"]: (r["n_vertices"], r["volume"], r["cut"], r["conductance"])
        for r in conductance(g, comm.select("v", "label")).collect()
    }
    labels = {r["v"]: r["label"] for r in comm.select("v", "label").collect()}
    want = conductance_ref(clean_edges(G_TOY7), labels)
    assert set(got) == set(want)
    for label, (n, vol, cut, phi) in want.items():
        gn, gvol, gcut, gphi = got[label]
        assert (gn, gvol, gcut) == (n, vol, cut)
        assert gphi == pytest.approx(phi, abs=1e-12)


def test_conductance_all_one_community_is_zero(spark):
    from pyspark.sql import functions as F

    from gunrock_spark.algorithms.modularity import conductance

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    comm = g.vertices.select("v", F.lit(0).alias("label"))
    rows = conductance(g, comm).collect()
    assert len(rows) == 1
    assert rows[0]["cut"] == 0
    assert rows[0]["conductance"] == 0.0


def test_conductance_rmat_vs_python(spark):
    from gunrock_spark.algorithms.modularity import conductance

    edges = [tuple(map(int, e)) for e in rmat_edges(scale=5, edge_factor=4, seed=11)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    comm = label_propagation(g, mode="mode", max_iter=2).state
    got = {
        r["label"]: (r["n_vertices"], r["volume"], r["cut"], r["conductance"])
        for r in conductance(g, comm.select("v", "label")).collect()
    }
    labels = {r["v"]: r["label"] for r in comm.select("v", "label").collect()}
    want = conductance_ref(clean_edges(edges), labels)
    assert set(got) == set(want)
    for label, (n, vol, cut, phi) in want.items():
        assert got[label][:3] == (n, vol, cut)
        assert got[label][3] == pytest.approx(phi, abs=1e-12)
