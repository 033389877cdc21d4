"""Property-based coverage (hypothesis) — the randomized-input net the
reference gets from seeded R-MAT sweeps (SURVEY.md §5.6), applied to
the invariants that must hold for EVERY edge list, not just fixtures.

Spark jobs per example are expensive, so examples are few and small;
the per-fixture and seeded-R-MAT tests carry the volume."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from gunrock_spark.algorithms.components import connected_components
from gunrock_spark.algorithms.pagerank import pagerank
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import edges_df
from tests.oracles import clean_edges, connected_components_ref, pagerank_ref

# small random directed multigraphs WITH self-loops and duplicates —
# the cleaning contract's whole input domain
edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(raw=edge_lists)
@SLOW
def test_cleaning_contract_matches_set_semantics(spark, raw):
    """from_df == the reference's COO->CSR pass (csr.cuh:588): drop
    self-loops, drop exact duplicates, keep everything else."""
    g = EdgeTable.from_df(edges_df(spark, raw))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = {(s, d) for s, d in raw if s != d}
    assert got == want


@given(raw=edge_lists)
@SLOW
def test_cc_labels_match_union_find_oracle(spark, raw):
    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    res = connected_components(g)
    got = {r["v"]: r["label"] for r in res.state.collect()}
    n = max(max(e) for e in cleaned) + 1
    ref = connected_components_ref(cleaned, n=n)
    # ref is indexed over 0..n-1; restrict to vertices present in the graph
    assert got == {v: int(ref[v]) for v in got}


@given(raw=edge_lists, iters=st.integers(1, 4))
@SLOW
def test_pagerank_fixed_iters_match_numpy(spark, raw, iters):
    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    res = pagerank(g, threshold=0.0, max_iter=iters)
    got = {r["v"]: r["rank"] for r in res.state.collect()}
    # the engine's vertex universe is edge ENDPOINTS (n = |endpoints|);
    # remap to a dense 0..n-1 space so the numpy ref sees the same n
    vs = sorted({v for e in cleaned for v in e})
    idx = {v: i for i, v in enumerate(vs)}
    dense = [(idx[s], idx[d]) for s, d in cleaned]
    # the CPU-reference port loops `while iteration <= max_iteration`
    # (test_pr.cu), i.e. runs max_iteration+1 passes — align counts
    ref = pagerank_ref(dense, n=len(vs), error=0.0, max_iteration=iters - 1)
    assert set(got) == set(vs)
    for v, rank in got.items():
        assert rank == pytest.approx(float(ref[idx[v]]), abs=1e-9)


@given(raw=edge_lists)
@SLOW
def test_core_numbers_match_exact_peeling_property(spark, raw):
    """h-index fixpoint == exact min-degree peeling coreness for EVERY
    graph (Lü et al. 2016 convergence theorem, exercised end-to-end)."""
    from gunrock_spark.algorithms.kcore import core_numbers
    from tests.test_kcore_hosts import _py_coreness

    clean = [(s, d) for s, d in raw if s != d]
    if not clean:
        return
    g = EdgeTable.from_df(edges_df(spark, raw))
    want = _py_coreness(clean)
    got = {r["v"]: r["c"] for r in core_numbers(g).state.select("v", "c").collect()}
    assert got == want


@given(raw=edge_lists, k=st.integers(1, 5))
@SLOW
def test_kcore_matches_python_peeling_property(spark, raw, k):
    from gunrock_spark.algorithms.kcore import k_core_vertices
    from tests.test_kcore_hosts import _py_kcore

    clean = [(s, d) for s, d in raw if s != d]
    if not clean:
        return
    g = EdgeTable.from_df(edges_df(spark, raw))
    want = _py_kcore(clean, k)
    got = {r["v"]: r["deg"] for r in k_core_vertices(g, k).collect()}
    assert got == want


@given(raw=edge_lists)
@SLOW
def test_matching_invariants_property(spark, raw):
    """For EVERY edge list: the matching is independent (no shared
    endpoint) and maximal (every simple undirected edge touches a
    matched vertex)."""
    from gunrock_spark.algorithms.matching import maximal_matching

    g = EdgeTable.from_df(edges_df(spark, raw))
    got = [(r["a"], r["b"]) for r in maximal_matching(g).state.collect()]
    verts = [v for e in got for v in e]
    assert len(verts) == len(set(verts))
    vset = set(verts)
    simple = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    assert all(a in vset or b in vset for a, b in simple)


@given(raw=edge_lists, alpha=st.sampled_from([0.05, 0.1]))
@SLOW
def test_katz_matches_python_property(spark, raw, alpha):
    from gunrock_spark.algorithms.katz import katz_centrality

    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    got = {
        r["v"]: r["score"]
        for r in katz_centrality(g, alpha=alpha, max_iter=4).state.collect()
    }
    verts = sorted({v for e in cleaned for v in e})
    x = {v: 1.0 for v in verts}
    for _ in range(4):
        msg = {v: 0.0 for v in verts}
        for s, d in cleaned:
            msg[d] += x[s]
        x = {v: 1.0 + alpha * msg[v] for v in verts}
    for v in x:
        assert got[v] == pytest.approx(x[v], abs=1e-9)


@given(vals=st.lists(st.integers(0, 1 << 45), min_size=1, max_size=30))
@SLOW
def test_log_histogram_total_and_edges_property(spark, vals):
    """Histogram counts always sum to the row count, and every value
    is >= its bin's lower edge (the conservative-quantile contract)."""
    from gunrock_spark.pipeline.sketches import log_histogram

    df = spark.createDataFrame([(v,) for v in vals], schema="x long")
    rows = log_histogram(df, "x", 8).collect()
    assert sum(r["n"] for r in rows) == len(vals)
    lo_by_bin = {r["bin"]: r["lo"] for r in rows}

    def pybin(x):
        if x <= 0:
            return -1
        o = x.bit_length() - 1
        return o * 8 + ((x - (1 << o)) * 8) // (1 << o)

    for v in vals:
        assert lo_by_bin[pybin(v)] <= max(v, 0)


@given(raw=edge_lists)
@SLOW
def test_squares_match_bruteforce_property(spark, raw):
    """4-cycle total + per-vertex counts equal the brute-force count
    on every random edge list."""
    from gunrock_spark.algorithms.motifs import square_count, squares_per_vertex
    from tests.test_motifs import squares_ref

    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    want_total, want_pv = squares_ref(cleaned)
    assert square_count(g) == want_total
    got = {r["v"]: r["squares"] for r in squares_per_vertex(g).collect()}
    assert got == want_pv


@given(raw=edge_lists)
@SLOW
def test_conductance_bounds_and_complement_property(spark, raw):
    """0 <= phi <= 1 for every community, and a 2-community split has
    equal cut on both sides."""
    from pyspark.sql import functions as F

    from gunrock_spark.algorithms.modularity import conductance

    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    comm = g.vertices.select("v", (F.col("v") % 2).alias("label"))
    rows = conductance(g, comm).collect()
    for r in rows:
        assert 0.0 <= r["conductance"] <= 1.0 + 1e-12
    if len(rows) == 2:
        assert rows[0]["cut"] == rows[1]["cut"]


@given(raw=edge_lists)
@SLOW
def test_densest_peel_density_is_bounded_by_best_round(spark, raw):
    """best_density == max over trajectory rows; members' own density
    equals the reported best (recomputed independently)."""
    from gunrock_spark.algorithms.densest import densest_subgraph

    cleaned = clean_edges(raw)
    if not cleaned:
        return
    g = EdgeTable.from_df(edges_df(spark, cleaned))
    res = densest_subgraph(g)
    traj = [r["density"] for r in res.rounds.collect()]
    if traj:
        assert res.best_density == pytest.approx(max(traj), abs=1e-12)
    members = {r["v"] for r in res.members.collect()}
    sym = {(a, b) for a, b in cleaned} | {(b, a) for a, b in cleaned}
    inside = sum(1 for a, b in sym if a in members and b in members)
    if members:
        assert inside / (2.0 * len(members)) == pytest.approx(
            res.best_density, abs=1e-12
        )
