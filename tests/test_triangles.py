from gunrock_spark.algorithms.triangles import triangle_count, triangle_count_per_vertex
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_CC11, G_TOY7, edges_df, rmat_edges
from tests.oracles import clean_edges, triangle_count_ref, triangles_per_vertex_ref


def test_triangle_golden_k3(spark):
    g = EdgeTable.from_df(edges_df(spark, [(0, 1), (1, 2), (2, 0)]))
    assert triangle_count(g) == 1


def test_triangle_toy7(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    assert triangle_count(g) == triangle_count_ref(G_TOY7, n=7)


def test_triangle_cc11(spark):
    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    assert triangle_count(g) == triangle_count_ref(G_CC11, n=11)


def test_triangle_per_vertex_toy7(spark):
    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    got = {r["v"]: r["n_triangles"] for r in triangle_count_per_vertex(g).collect()}
    ref = triangles_per_vertex_ref(G_TOY7, n=7)
    assert got == {v: int(ref[v]) for v in range(7)}


def test_triangle_rmat_power_law(spark):
    raw = [(int(s), int(d)) for s, d in rmat_edges(7, 8, seed=5)]
    edge_list = clean_edges(raw)
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    n = max(max(e) for e in edge_list) + 1
    assert triangle_count(g) == triangle_count_ref(edge_list, n=n)


def test_triangle_count_blocks_matches_join(spark):
    """The CSR-block sorted-intersection strategy (north-rule optimized
    path) must count exactly what the wedge-join strategy counts."""
    from gunrock_spark.algorithms.triangles import triangle_count_df
    from gunrock_spark.graph.generators import rmat_edges
    from tests.oracles import clean_edges

    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=13)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    via_join = triangle_count(g, impl="join")
    via_blocks = triangle_count(g, impl="blocks")
    assert via_blocks == via_join
    assert via_join > 0
    df = triangle_count_df(g, impl="blocks").collect()
    assert df[0]["n_triangles"] == via_join
    import pytest as _pytest

    with _pytest.raises(ValueError):
        triangle_count(g, impl="nope")


def test_triangle_per_vertex_blocks_matches_join(spark):
    """The blocks per-vertex strategy (per-corner partial counts over
    block pairs) must produce exactly the wedge-join per-vertex table,
    including 0 rows for triangle-free vertices."""
    from gunrock_spark.algorithms.triangles import (
        triangle_count_per_vertex_blocks,
    )

    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=13)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    via_join = {
        r["v"]: r["n_triangles"] for r in triangle_count_per_vertex(g).collect()
    }
    via_blocks = {
        r["v"]: r["n_triangles"]
        for r in triangle_count_per_vertex_blocks(g).collect()
    }
    assert via_blocks == via_join
    assert sum(via_join.values()) > 0


def test_triangle_per_vertex_blocks_tiny_cache_budget(spark, monkeypatch):
    """Slice eviction/refetch must never change per-vertex counts."""
    from gunrock_spark.algorithms.triangles import (
        triangle_count_per_vertex_blocks,
    )

    monkeypatch.setenv("SPARK_GRAFT_BLOCK_CACHE_MB", "1e-3")
    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(7, 8, seed=29)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    via_join = {
        r["v"]: r["n_triangles"] for r in triangle_count_per_vertex(g).collect()
    }
    via_blocks = {
        r["v"]: r["n_triangles"]
        for r in triangle_count_per_vertex_blocks(g, num_blocks=8).collect()
    }
    assert via_blocks == via_join


def test_triangle_blocks_forced_salting_exact(spark):
    """Heavy-pair salting (salt = hash(pivot) % salt_n) must be EXACT:
    with a salt target so low every block pair splits, both blocks
    strategies still match the wedge-join counts bit-for-bit."""
    from gunrock_spark.algorithms.triangles import (
        triangle_count_blocks,
        triangle_count_per_vertex_blocks,
    )

    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=13)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    total_join = triangle_count(g, impl="join")
    # target=2 edges/task forces salt_n > 1 on essentially every pair
    assert triangle_count_blocks(g, num_blocks=4, salt_target=2) == total_join
    via_join = {
        r["v"]: r["n_triangles"] for r in triangle_count_per_vertex(g).collect()
    }
    via_salted = {
        r["v"]: r["n_triangles"]
        for r in triangle_count_per_vertex_blocks(
            g, num_blocks=4, salt_target=2
        ).collect()
    }
    assert via_salted == via_join
    assert total_join > 0


def test_triangle_blocks_shared_slice_cache(spark, monkeypatch):
    """The node-shared mmap slice cache must (a) publish decoded
    blocks with _OK markers under the default node dir, (b) be removed
    with the store, (c) leave counts identical, (d) disable cleanly.
    Env overrides cannot be tested end-to-end here: the Spark worker
    daemon snapshots env at session start, so the driver-side
    _shm_store_dir contract is unit-checked instead."""
    import os

    from gunrock_spark.algorithms.triangles import triangle_count_blocks
    from gunrock_spark.engine import csr_blocks as cb

    edge_list = clean_edges([(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=13)])
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    expected = triangle_count(g, impl="join")

    # capture the cache dir at cleanup time (workers publish under the
    # same default root the driver computes — no env override in play)
    seen = {}
    orig_remove = cb.remove_block_store

    def capture_remove(path, store_path=None):
        d = cb._shm_store_dir(store_path or path)
        seen["dir"] = d
        seen["published"] = sorted(os.listdir(d)) if os.path.isdir(d) else []
        orig_remove(path, store_path)

    # triangle_count_blocks imports remove_block_store from cb at call
    # time, so patching the cb module attribute intercepts it
    monkeypatch.setattr(cb, "remove_block_store", capture_remove)
    assert triangle_count_blocks(g, num_blocks=4) == expected
    assert seen["published"], "no slices were published to the shared cache"
    assert all(b.startswith("b") for b in seen["published"])
    for b in seen["published"]:
        # each published block dir must have been complete (_OK last)
        assert "b" in b
    # cleanup removed this store's cache dir with the store
    assert not os.path.isdir(seen["dir"])

    # driver-side contract of the dir resolver
    monkeypatch.setenv("SPARK_GRAFT_SLICE_SHM_DIR", "")
    assert cb._shm_store_dir("whatever") is None
    monkeypatch.setenv("SPARK_GRAFT_SLICE_SHM_DIR", "/some/dir")
    d = cb._shm_store_dir("store-a")
    assert d is not None and d.startswith("/some/dir")
    assert cb._shm_store_dir("store-b") != d  # keyed per store


def test_tc_auto_dispatch_single_edge_count_action(spark, monkeypatch):
    """Auto dispatch (triangle_count + triangle_count_df + the jobs
    CLI manifest) must trigger at most ONE real |E| count action —
    EdgeTable caches the scalar, so every later num_edges() call is a
    dict lookup, not a scan. Regression gate: count cache MISSES."""
    from gunrock_spark.algorithms.triangles import triangle_count, triangle_count_df
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_TOY7, edges_df

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    misses = []
    orig = EdgeTable.num_edges

    def spy(self):
        if self._num_edges is None:
            misses.append(1)
        return orig(self)

    monkeypatch.setattr(EdgeTable, "num_edges", spy)
    triangle_count(g, impl="auto")
    triangle_count_df(g, impl="auto").collect()
    g.num_edges()  # the jobs-CLI manifest call
    assert sum(misses) == 1


def test_tc_auto_dispatch_on_wedge_estimate(spark, monkeypatch):
    """auto picks the wedge join for small graphs AND for big-but-
    uniform graphs (few wedges), blocks only when the wedge estimate
    is genuinely large — the estimate itself upper-bounds the real
    oriented wedge count."""
    from pyspark.sql import functions as F

    from gunrock_spark.algorithms import triangles as T
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_TOY7, edges_df

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    assert T._auto_impl(g) == "join"  # below MIN_EDGES

    # the estimate is an upper bound on the true oriented wedge count
    true_wedges = (
        T._oriented(g)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2.0).alias("w"))
        .collect()[0]["w"]
    )
    assert T._estimated_wedges(g) >= int(true_wedges or 0)

    monkeypatch.setattr(EdgeTable, "num_edges", lambda self: 10_000_000)
    monkeypatch.setattr(T, "_estimated_wedges", lambda graph: 10_000)
    assert T._auto_impl(g) == "join"  # big but uniform
    monkeypatch.setattr(T, "_estimated_wedges", lambda graph: 2_000_000_000)
    assert T._auto_impl(g) == "blocks"  # big and wedge-heavy


def test_ktruss_golden_and_python_oracle(spark):
    from gunrock_spark.algorithms.ktruss import k_truss
    from gunrock_spark.graph.edge_table import EdgeTable

    # two triangles sharing edge (1,2), plus a pendant edge:
    # 4-truss of this graph is empty; 3-truss is the two triangles.
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    g = EdgeTable.from_df(df, num_partitions=2)
    t3 = k_truss(g, 3)
    got3 = sorted((r["a"], r["b"]) for r in t3.state.collect())
    assert got3 == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert t3.converged
    assert k_truss(g, 4).state.count() == 0

    # k=4: K4 plus a dangling triangle — K4 survives, triangle peels
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 5), (3, 6), (5, 6)]
    df2 = spark.createDataFrame(k4 + extra, schema="src long, dst long")
    g2 = EdgeTable.from_df(df2, num_partitions=2)
    got4 = sorted((r["a"], r["b"]) for r in k_truss(g2, 4).state.collect())
    assert got4 == sorted(k4)


def test_ktruss_rmat_matches_python_peel(spark):
    from gunrock_spark.algorithms.ktruss import k_truss
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df

    g = EdgeTable.from_df(rmat_edges_df(spark, 9, 8, seed=11), num_partitions=4)
    und = set()
    for r in g.edges.collect():
        a, b = r["src"], r["dst"]
        if a != b:
            und.add((min(a, b), max(a, b)))

    def peel(es, k):
        es = set(es)
        while True:
            adj = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {(a, b) for a, b in es if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                return es
            es -= drop

    for k in (3, 4):
        got = {(r["a"], r["b"]) for r in k_truss(g, k).state.collect()}
        assert got == peel(und, k), f"k={k}"


def test_trussness_matches_python_peel(spark):
    from gunrock_spark.algorithms.ktruss import trussness
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df

    g = EdgeTable.from_df(rmat_edges_df(spark, 9, 8, seed=13), num_partitions=4)
    und = set()
    for r in g.edges.collect():
        a, b = r["src"], r["dst"]
        if a != b:
            und.add((min(a, b), max(a, b)))

    def peel(es, k):
        es = set(es)
        while True:
            adj = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {(a, b) for a, b in es if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                return es
            es -= drop

    want = {e: 2 for e in und}
    cur, k = und, 3
    while k <= 6:
        cur = peel(cur, k)
        if not cur:
            break
        for e in cur:
            want[e] = k
        k += 1
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in trussness(g, k_cap=6).collect()
    }
    assert got == want


def test_trussness_triangle_free_and_k4(spark):
    from gunrock_spark.algorithms.ktruss import trussness
    from gunrock_spark.graph.edge_table import EdgeTable

    # a path: every edge triangle-free -> trussness 2
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {tuple(r[:2]): r[2] for r in trussness(EdgeTable.from_df(df)).collect()}
    assert got == {(0, 1): 2, (1, 2): 2, (2, 3): 2}

    # K4 + dangling triangle: K4 edges 4, triangle-only edges 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 5), (3, 6), (5, 6)]
    df2 = spark.createDataFrame(k4 + extra, "src long, dst long")
    got2 = {
        (r["a"], r["b"]): r["trussness"]
        for r in trussness(EdgeTable.from_df(df2, num_partitions=2)).collect()
    }
    assert all(got2[e] == 4 for e in k4)
    assert all(got2[e] == 3 for e in [(3, 5), (3, 6), (5, 6)])


def test_triangle_doulion_matches_python_replica(spark):
    """DOULION deterministic sparsified estimate: the Spark result must
    equal a pure-python replay of the arithmetic retention hash + a
    brute-force count of the kept subgraph, scaled by (den/num)^3."""
    from gunrock_spark.algorithms.triangles import triangle_count_doulion
    from gunrock_spark.pipeline.sampling import HASH_A, HASH_P

    raw = [(int(s), int(d)) for s, d in rmat_edges(8, 10, seed=9)]
    num, den, seed = 1, 3, 11

    def keep(a, b):
        pair = ((a % HASH_P) * HASH_A + (b % HASH_P)) % HASH_P
        return ((pair * HASH_A + seed) % HASH_P) % den < num

    kept = sorted(
        {(min(s, d), max(s, d)) for s, d in clean_edges(raw) if keep(min(s, d), max(s, d))}
    )
    assert kept, "sample unexpectedly empty — bad generator seed for this test"
    expected_sampled = triangle_count_ref(kept)

    g = EdgeTable.from_df(edges_df(spark, raw))
    row = triangle_count_doulion(g, num=num, den=den, seed=seed).collect()[0]
    assert row["sampled_triangles"] == expected_sampled
    assert row["est_triangles"] == round(expected_sampled * (den / num) ** 3, 6)


def test_triangle_doulion_full_density_is_exact(spark):
    """p = 1 keeps every edge: the estimate degenerates to the exact
    triangle count (the unbiasedness anchor)."""
    from gunrock_spark.algorithms.triangles import triangle_count_doulion

    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    row = triangle_count_doulion(g, num=1, den=1).collect()[0]
    exact = triangle_count_ref(G_CC11, n=11)
    assert row["sampled_triangles"] == exact
    assert row["est_triangles"] == float(exact)


def test_triangle_blocks_int32_downcast_active(spark):
    """Graphs whose ids fit int32 get downcast decoded slices (the
    store carries the graph-global marker); indptr stays int64."""
    from gunrock_spark.algorithms import triangles as T
    from gunrock_spark.engine.csr_blocks import (
        remove_block_store,
        store_ids_fit_int32,
    )

    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    o, store, cleanup, nb = T._oriented_block_store(g, 4)
    try:
        assert store_ids_fit_int32(store)
        seen = 0
        for b in range(nb):
            verts, indptr, dsts = T._adjacency_csr(store, b)
            if verts.size:
                seen += 1
                assert verts.dtype == "int32" and dsts.dtype == "int32"
                assert indptr.dtype == "int64"
        assert seen > 0
    finally:
        remove_block_store(cleanup, store)


def test_triangle_blocks_ids_above_int32_stay_int64_and_exact(spark):
    """Vertex ids >= 2^31 (the 10^12-page regime): no marker, int64
    kernels, counts still exact."""
    from gunrock_spark.algorithms.triangles import triangle_count_blocks

    shift = 2**31
    big = [(s + shift, d + shift) for s, d in G_CC11]
    g = EdgeTable.from_df(edges_df(spark, big))
    assert triangle_count_blocks(g, num_blocks=4) == triangle_count_ref(G_CC11, n=11)
