"""k-core / coreness (algorithms/kcore.py) and host-level rollup
(ingest/hosts.py) against pure-python references."""

import collections

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.kcore import core_numbers, k_core_vertices
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import rmat_edges_df


def _py_kcore(edges, k):
    """Reference peeling on an undirected edge set: returns
    {v: induced degree} of the k-core."""
    nbrs = collections.defaultdict(set)
    for s, t in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    alive = set(nbrs)
    while True:
        doomed = {v for v in alive if len(nbrs[v] & alive) < k}
        if not doomed:
            break
        alive -= doomed
    return {v: len(nbrs[v] & alive) for v in alive}


def _py_coreness(edges):
    """Reference coreness via exact peeling (remove min-degree vertex;
    its coreness = max degree seen so far at removal)."""
    nbrs = collections.defaultdict(set)
    for s, t in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    core = {}
    seen = 0
    remaining = set(deg)
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        seen = max(seen, deg[v])
        core[v] = seen
        remaining.discard(v)
        for u in nbrs[v]:
            if u in remaining:
                deg[u] -= 1
    return core


@pytest.fixture(scope="module")
def toy_edges(spark):
    # a 4-clique (3-core), a path tail, and a triangle hanging off
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # 4-clique
        (3, 4), (4, 5),                                   # tail
        (5, 6), (6, 7), (7, 5),                           # triangle
    ]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    return edges, EdgeTable.from_df(df)


def test_kcore_toy_matches_python(spark, toy_edges):
    edges, g = toy_edges
    for k in (1, 2, 3, 4):
        want = _py_kcore(edges, k)
        got = {r["v"]: r["deg"] for r in k_core_vertices(g, k).collect()}
        assert got == want, f"k={k}"


def test_kcore_rmat_matches_python(spark):
    df = rmat_edges_df(spark, scale=8, edge_factor=4, seed=5)
    edges = [(r["src"], r["dst"]) for r in df.collect()]
    g = EdgeTable.from_df(df)
    for k in (2, 4):
        want = _py_kcore(edges, k)
        got = {r["v"]: r["deg"] for r in k_core_vertices(g, k).collect()}
        assert got == want, f"k={k}"


def test_core_numbers_match_exact_peeling(spark, toy_edges):
    edges, g = toy_edges
    want = _py_coreness(edges)
    res = core_numbers(g)
    got = {r["v"]: r["c"] for r in res.state.select("v", "c").collect()}
    assert got == want
    assert res.converged


def test_core_numbers_rmat_matches_exact_peeling(spark):
    df = rmat_edges_df(spark, scale=8, edge_factor=4, seed=5)
    edges = [(r["src"], r["dst"]) for r in df.collect()]
    want = _py_coreness(edges)
    res = core_numbers(EdgeTable.from_df(df))
    got = {r["v"]: r["c"] for r in res.state.select("v", "c").collect()}
    assert got == want
    # coreness consistency: the max-core vertices form exactly the
    # k_core at k = max coreness
    kmax = max(want.values())
    core = {r["v"] for r in k_core_vertices(EdgeTable.from_df(df), kmax).collect()}
    assert core == {v for v, c in want.items() if c == kmax}


def _py_onion(edges):
    """Reference onion decomposition (Hébert-Dufresne et al. 2016):
    synchronous peel rounds; round i removes every alive vertex with
    alive-induced degree <= k_i = max(k_{i-1}, min alive degree).
    Returns {v: (layer, core)}."""
    nbrs = collections.defaultdict(set)
    for s, t in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    alive = set(deg)
    k, layer, out = 0, 0, {}
    while alive:
        k = max(k, min(deg[v] for v in alive))
        layer += 1
        rm = {v for v in alive if deg[v] <= k}
        for v in rm:
            out[v] = (layer, k)
        alive -= rm
        for v in rm:
            for u in nbrs[v]:
                if u in alive:
                    deg[u] -= 1
    return out


def test_onion_toy_matches_python(spark, toy_edges):
    from gunrock_spark.algorithms.kcore import onion_layers

    edges, g = toy_edges
    want = _py_onion(edges)
    got = {r["v"]: (r["layer"], r["core"]) for r in onion_layers(g).collect()}
    assert got == want


def test_onion_rmat_matches_python_and_hindex_coreness(spark):
    from gunrock_spark.algorithms.kcore import onion_layers

    df = rmat_edges_df(spark, scale=8, edge_factor=4, seed=5)
    edges = [(r["src"], r["dst"]) for r in df.collect()]
    g = EdgeTable.from_df(df)
    want = _py_onion(edges)
    got = {r["v"]: (r["layer"], r["core"]) for r in onion_layers(g).collect()}
    assert got == want
    # the onion `core` column IS the core number — must agree with the
    # independently-computed h-index fixpoint route
    hind = {r["v"]: r["c"] for r in core_numbers(g).state.select("v", "c").collect()}
    assert {v: c for v, (_, c) in got.items()} == hind


# --------------------------------------------------------------------------
# host rollup
# --------------------------------------------------------------------------


def test_host_of_extracts_host(spark):
    from gunrock_spark.ingest.hosts import host_of

    df = spark.createDataFrame(
        [
            ("https://a.example/x",),
            ("http://b.example:8080/y?q=1",),
            ("ftp://c.example/z",),
            ("/relative/path",),
            ("mailto:notahost",),
        ],
        schema="url string",
    )
    got = [r[0] for r in df.select(host_of("url")).collect()]
    assert got == ["a.example", "b.example:8080", "c.example", "", ""]


def test_host_link_rollup_counts_and_drops_self(spark):
    from gunrock_spark.ingest.hosts import host_link_rollup

    links = spark.createDataFrame(
        [
            ("https://a.example/1", "https://b.example/x"),
            ("https://a.example/2", "https://b.example/y"),
            ("https://a.example/3", "https://a.example/1"),  # intra-host
            ("https://b.example/x", "https://a.example/1"),
            ("/rel", "https://b.example/x"),                  # schemeless src
        ],
        schema="url string, target_url string",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_rollup(links).collect()
    }
    assert got == {("a.example", "b.example"): 2, ("b.example", "a.example"): 1}
    kept = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_rollup(links, keep_self=True).collect()
    }
    assert kept[("a.example", "a.example")] == 1


def test_weighted_pagerank_uniform_equals_plain(spark, toy_edges):
    from gunrock_spark.algorithms.pagerank import pagerank, weighted_pagerank

    edges, g = toy_edges
    df = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], schema="src long, dst long, weight double"
    )
    gw = EdgeTable.from_df(df, weight="weight")
    plain = {r["v"]: r["rank"] for r in pagerank(g, threshold=0.0, max_iter=8).state.collect()}
    weighted = {
        r["v"]: r["rank"]
        for r in weighted_pagerank(gw, threshold=0.0, max_iter=8).state.collect()
    }
    assert set(plain) == set(weighted)
    assert all(abs(plain[v] - weighted[v]) < 1e-12 for v in plain)


def test_weighted_pagerank_matches_numpy(spark):
    import numpy as np

    from gunrock_spark.algorithms.pagerank import weighted_pagerank

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0)]
    df = spark.createDataFrame(edges, schema="src long, dst long, weight double")
    g = EdgeTable.from_df(df, weight="weight")
    got = {
        r["v"]: r["rank"]
        for r in weighted_pagerank(g, threshold=0.0, max_iter=20).state.collect()
    }
    n, delta = 4, 0.85
    r = np.full(n, 1.0 / n)
    wout = {0: 4.0, 1: 2.0, 2: 1.0, 3: 5.0}
    for _ in range(20):
        msg = np.zeros(n)
        for s, t, w in edges:
            msg[t] += r[s] * w / wout[s]
        r = (1 - delta) / n + delta * msg
    assert all(abs(got[v] - r[v]) < 1e-12 for v in range(n))


def test_host_graph_end_to_end_pagerank(spark):
    """pages -> host graph -> PageRank runs unchanged on the rolled-up
    EdgeTable (the 'host rank' flow)."""
    from gunrock_spark.algorithms.pagerank import pagerank
    from gunrock_spark.graph.generators import pages_table
    from gunrock_spark.ingest.hosts import host_graph

    # url_for maps 1000 pages per site -> 2048 pages span 3 hosts and
    # the R-MAT-ish link targets cross them
    pages, _ = pages_table(spark, n_pages=2048, seed=3)
    g, hosts, rollup = host_graph(pages)
    assert hosts.count() >= 2
    # weights present for weighted primitives
    assert "weight" in g.edges.columns
    assert rollup.where(F.col("n_links") < 1).count() == 0
    assert g.num_edges() > 0
    res = pagerank(g, max_iter=5, threshold=0.0)
    assert res.state.count() == g.num_vertices()


# --- host_template_stats (ingest/hosts.py) ----------------------------------


def test_host_template_stats(spark):
    from gunrock_spark.ingest.hosts import host_template_stats

    rows = [
        # templated.com: 4 pages, all the same text
        ("https://templated.com/1", "same boilerplate"),
        ("https://templated.com/2", "same boilerplate"),
        ("https://templated.com/3", "same boilerplate"),
        ("https://templated.com/4", "same boilerplate"),
        # articles.org: 2 pages, distinct
        ("https://articles.org/a", "first article text"),
        ("https://articles.org/b", "second article text"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r.host: r for r in host_template_stats(df).collect()}
    t = got["templated.com"]
    assert (t.n_pages, t.n_distinct_texts, t.template_rate) == (4, 1, 0.75)
    a = got["articles.org"]
    assert (a.n_pages, a.n_distinct_texts, a.template_rate) == (2, 2, 0.0)


def test_onion_checkpoint_kill_resume(spark, tmp_path):
    """A peel killed mid-run resumes from the snapshot (threshold /
    alive / min-degree all rederived from the state) and produces the
    exact single-run decomposition."""
    from gunrock_spark.algorithms.kcore import onion_decomposition, onion_layers

    df = rmat_edges_df(spark, scale=8, edge_factor=4, seed=5)
    g = EdgeTable.from_df(df)
    want = {(r["v"], r["layer"], r["core"]) for r in onion_layers(g).collect()}

    ck = str(tmp_path / "onion_ck")
    partial = onion_decomposition(
        g, max_iter=4, checkpoint_dir=ck, checkpoint_interval=2
    )
    assert not partial.converged  # the "kill": budget exhausted mid-peel
    resumed = onion_decomposition(g, checkpoint_dir=ck, resume=True)
    assert resumed.converged
    got = {(r["v"], r["layer"], r["core"]) for r in resumed.state.collect()}
    assert got == want
    # resuming a converged run is a no-op (no extra peel round)
    again = onion_decomposition(g, checkpoint_dir=ck, resume=True)
    assert again.converged and again.iterations == resumed.iterations
