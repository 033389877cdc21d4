"""Graph statistics (clustering / transitivity / reciprocity /
assortativity) and the Bloom filter vs pure-Python oracles."""

import math

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.gstats import (
    powerlaw_alpha,
    degree_assortativity,
    local_clustering,
    reciprocity,
    transitivity,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df, rmat_edges
from gunrock_spark.pipeline.sketches import (
    CMS_P,
    _coeffs,
    bloom_build,
    bloom_contains,
    bloom_merge,
)
from gunrock_spark.functions.hashing import h60_py
from tests.oracles import clean_edges


def _nbrs(edge_list):
    nbrs: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    return nbrs


def _tri_per_vertex(nbrs):
    t = {v: 0 for v in nbrs}
    for v, ns in nbrs.items():
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1 :]:
                if b in nbrs.get(a, ()):
                    t[v] += 1
    return t


G = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 2), (5, 6), (6, 5), (1, 0)]


def _graph(spark, edge_list):
    return EdgeTable.from_df(edges_df(spark, edge_list))


@pytest.mark.parametrize("seed", [7, 23])
def test_local_clustering_matches_python(spark, seed):
    edge_list = clean_edges(
        [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=seed)]
    )
    nbrs = _nbrs(edge_list)
    tri = _tri_per_vertex(nbrs)
    got = {
        r["v"]: (r["n_triangles"], r["deg"], r["lcc"])
        for r in local_clustering(_graph(spark, edge_list)).collect()
    }
    verts = set(nbrs) | {v for e in edge_list for v in e}
    assert set(got) == verts
    for v in verts:
        d = len(nbrs.get(v, ()))
        t = tri.get(v, 0)
        want_lcc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        assert got[v][0] == t, v
        assert got[v][1] == d, v
        assert got[v][2] == pytest.approx(want_lcc, abs=1e-12), v


def test_transitivity_golden(spark):
    # G: triangles {0,1,2} and {2,3,4}; simple degrees:
    # 0:2 1:2 2:4 3:2 4:2 5:1 6:1 -> wedges = 1+1+6+1+1 = 10
    row = transitivity(_graph(spark, G)).collect()[0]
    assert row["n_triangles"] == 2
    assert row["n_wedges"] == 10
    assert row["transitivity"] == pytest.approx(6.0 / 10.0, abs=1e-12)


def test_reciprocity_golden(spark):
    # distinct non-loop directed edges of G: 9 listed, (1,0) dups (0,1)
    # reversed? edges = {(0,1),(0,2),(1,2),(2,3),(3,4),(4,2),(5,6),
    # (6,5),(1,0)} -> reciprocated: (0,1),(1,0),(5,6),(6,5) = 4 of 9
    row = reciprocity(_graph(spark, G)).collect()[0]
    assert row["n_edges"] == 9
    assert row["n_reciprocated"] == 4
    assert row["reciprocity"] == pytest.approx(4.0 / 9.0, abs=1e-12)


def test_assortativity_matches_python(spark):
    edge_list = clean_edges(
        [(int(s), int(d)) for s, d in rmat_edges(6, 4, seed=11)]
    )
    nbrs = _nbrs(edge_list)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    und = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    pairs = [(deg[a], deg[b]) for a, b in und] + [
        (deg[b], deg[a]) for a, b in und
    ]
    m = len(pairs)
    sj = sum(j for j, _ in pairs)
    sjk = sum(j * k for j, k in pairs)
    sj2 = sum(j * j for j, _ in pairs)
    want = (m * sjk - sj * sj) / (m * sj2 - sj * sj)
    row = degree_assortativity(_graph(spark, edge_list)).collect()[0]
    assert row["m2"] == m
    assert row["sum_j"] == sj
    assert row["sum_jk"] == sjk
    assert row["sum_j2"] == sj2
    assert row["assortativity"] == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _bloom_pos_py(x: str, m_bits: int, k: int, seed: str = "bloom"):
    hm = h60_py(x) % CMS_P
    return {((a * hm + b) % CMS_P) % m_bits for a, b in _coeffs(k, seed)}


def test_bloom_build_matches_python(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    got = {r["pos"] for r in bloom_build(df, "term", m_bits=512, k=4).collect()}
    want = set()
    for w in WORDS:
        want |= _bloom_pos_py(w, 512, 4)
    assert got == want
    assert len(got) <= 512


def test_bloom_no_false_negatives_and_probe(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    bloom = bloom_build(df, "term", m_bits=512, k=4)
    probes = spark.createDataFrame(
        [(w,) for w in WORDS] + [("missing-%d" % i,) for i in range(20)],
        "term string",
    )
    got = {
        r["term"]: r["maybe"]
        for r in bloom_contains(bloom, probes, "term", m_bits=512, k=4).collect()
    }
    for w in WORDS:
        assert got[w] is True, w  # zero false negatives
    bits = set()
    for w in WORDS:
        bits |= _bloom_pos_py(w, 512, 4)
    for i in range(20):
        w = "missing-%d" % i
        want = _bloom_pos_py(w, 512, 4) <= bits  # fp iff all bits set
        assert got[w] == want, w


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([(w,) for w in WORDS[:3]], "term string")
    b = spark.createDataFrame([(w,) for w in WORDS[3:]], "term string")
    merged = bloom_merge(
        bloom_build(a, "term", m_bits=256, k=3),
        bloom_build(b, "term", m_bits=256, k=3),
    )
    whole = bloom_build(
        spark.createDataFrame([(w,) for w in WORDS], "term string"),
        "term",
        m_bits=256,
        k=3,
    )
    assert {r["pos"] for r in merged.collect()} == {
        r["pos"] for r in whole.collect()
    }


def test_powerlaw_alpha_matches_python(spark):
    edges = clean_edges(rmat_edges(8, 8, seed=5))
    g = EdgeTable.from_df(edges_df(spark, edges))
    row = powerlaw_alpha(g, x_min=2).collect()[0]
    # python replica over the same undirected simple degrees
    und = {tuple(sorted(e)) for e in edges}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= 2]
    want = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert row.n_tail == len(tail)
    assert row.alpha == pytest.approx(want, rel=1e-9)
    # R-MAT is heavy-tailed: exponent lands in the plausible band
    assert 1.3 < row.alpha < 4.0


def test_diameter_double_sweep_path_graph(spark):
    from gunrock_spark.algorithms.gstats import diameter_double_sweep
    from gunrock_spark.graph.generators import edges_df

    # directed path 0->1->2->3->4: undirected diameter 4; the first
    # sweep from 0 finds 4, the second sweep from 4 measures 4
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]))
    row = diameter_double_sweep(g).collect()[0]
    assert (row.start_v, row.far_v, row.diameter_lb) == (0, 4, 4)


def test_diameter_double_sweep_cycle_and_tie(spark):
    from gunrock_spark.algorithms.gstats import diameter_double_sweep
    from gunrock_spark.graph.generators import edges_df

    # 4-cycle: ecc 2 everywhere; farthest from 0 is {2} at depth 2
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    row = diameter_double_sweep(g).collect()[0]
    assert (row.start_v, row.far_v, row.diameter_lb) == (0, 2, 2)


def test_avg_neighbor_degree_star_and_path(spark):
    from gunrock_spark.algorithms.gstats import avg_neighbor_degree
    from gunrock_spark.graph.generators import edges_df

    # star: center 0 with leaves 1..4 -> leaves (deg 1) see deg-4
    # center; center (deg 4) sees deg-1 leaves
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]))
    got = {r.degree: (r.avg_nbr_degree, r.n_vertices)
           for r in avg_neighbor_degree(g).collect()}
    assert got[1] == (4.0, 4)
    assert got[4] == (1.0, 1)

    # path 0-1-2: ends (deg 1) see the deg-2 middle; middle sees two
    # deg-1 ends -> 1.0
    g2 = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2)]))
    got2 = {r.degree: (r.avg_nbr_degree, r.n_vertices)
            for r in avg_neighbor_degree(g2).collect()}
    assert got2[1] == (2.0, 2)
    assert got2[2] == (1.0, 1)


def test_avg_neighbor_degree_weighted_class_mean(spark):
    from gunrock_spark.algorithms.gstats import avg_neighbor_degree
    from gunrock_spark.graph.generators import edges_df

    # two deg-1 vertices with different neighbor degrees: 3 attaches
    # to hub 0 (deg 3), 4 attaches to 5 (deg 1 -> no, make deg 2)
    # graph: 0-1, 0-2, 0-3 (hub 0 deg 3), 4-5, 5-6 (path)
    edges = [(0, 1), (0, 2), (0, 3), (4, 5), (5, 6)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    got = {r.degree: r.avg_nbr_degree for r in avg_neighbor_degree(g).collect()}
    # deg-1 class: 1,2,3 see deg 3 each; 4,6 see deg 2 each ->
    # weighted mean = (3+3+3+2+2)/5 = 2.6
    assert got[1] == 2.6


def test_rich_club_golden_star_plus_core(spark):
    from gunrock_spark.algorithms.gstats import rich_club

    # core triangle {0,1,2} + leaves hanging off 0: deg(0)=4, deg(1)=deg(2)=2, leaves=1
    edges = [(0, 1), (1, 2), (0, 2), (0, 8), (0, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = EdgeTable.from_df(df)
    got = {r.k: (r.n_k, r.e_k, r.phi) for r in rich_club(g).collect()}
    # k=1: nodes with deg>1 = {0,1,2}, edges among them = 3 -> phi=1.0
    assert got[1] == (3, 3, 1.0)
    # k=2: only vertex 0 survives -> n_k=1 < 2, row excluded
    assert 2 not in got
    assert set(got) == {1}


def test_rich_club_matches_python(spark):
    from gunrock_spark.algorithms.gstats import rich_club

    edges = [(int(s), int(d)) for s, d in rmat_edges(scale=7, edge_factor=4, seed=3)]
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    got = {r.k: (r.n_k, r.e_k, r.phi) for r in rich_club(g).collect()}

    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    exp = {}
    for k in sorted(set(deg.values())):
        rich = {v for v, dv in deg.items() if dv > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for a, b in und if a in rich and b in rich)
        exp[k] = (
            len(rich),
            ek,
            round(2.0 * ek / (len(rich) * (len(rich) - 1)), 9),
        )
    assert got == exp
