"""The byte-bounded worker-local slice cache (VERDICT r2 #1/#9): the
blocks strategies' per-worker memory must be bounded by the
SPARK_GRAFT_BLOCK_CACHE_MB budget with refetch-on-miss, not by
all-P-slices residency. These tests drive the cache directly in the
driver process — the same code object the Python workers run."""

import os

import numpy as np
import pytest

from gunrock_spark.engine.csr_blocks import LRUBytesCache


def _mb(monkeypatch, mb: float) -> None:
    monkeypatch.setenv("SPARK_GRAFT_BLOCK_CACHE_MB", str(mb))


def test_lru_evicts_oldest_beyond_budget(monkeypatch):
    _mb(monkeypatch, 1e-3)  # 1000 bytes
    c = LRUBytesCache()
    c.put(("s", 0, "k"), "a", 400)
    c.put(("s", 1, "k"), "b", 400)
    assert len(c) == 2 and c.total_bytes == 800
    c.put(("s", 2, "k"), "c", 400)  # 1200 > 1000 -> drop oldest
    assert len(c) == 2 and c.total_bytes == 800
    assert c.get(("s", 0, "k")) is None  # evicted
    assert c.get(("s", 1, "k")) == "b"
    assert c.get(("s", 2, "k")) == "c"
    assert c.evictions == 1


def test_lru_get_refreshes_recency(monkeypatch):
    _mb(monkeypatch, 1e-3)
    c = LRUBytesCache()
    c.put(("s", 0, "k"), "a", 400)
    c.put(("s", 1, "k"), "b", 400)
    assert c.get(("s", 0, "k")) == "a"  # 0 now most recent
    c.put(("s", 2, "k"), "c", 400)  # evicts 1, not 0
    assert c.get(("s", 1, "k")) is None
    assert c.get(("s", 0, "k")) == "a"


def test_lru_single_oversized_entry_stays_until_next_insert(monkeypatch):
    # a slice larger than the whole budget must survive while it is
    # the entry the running task needs, and go on the next insert
    _mb(monkeypatch, 1e-3)
    c = LRUBytesCache()
    c.put(("s", 0, "k"), "huge", 5000)
    assert c.get(("s", 0, "k")) == "huge"
    c.put(("s", 1, "k"), "b", 400)
    assert c.get(("s", 0, "k")) is None
    assert c.get(("s", 1, "k")) == "b"


def test_lru_replace_same_key_updates_bytes(monkeypatch):
    _mb(monkeypatch, 1.0)
    c = LRUBytesCache()
    c.put(("s", 0, "k"), "a", 400)
    c.put(("s", 0, "k"), "a2", 700)
    assert len(c) == 1 and c.total_bytes == 700
    assert c.get(("s", 0, "k")) == "a2"


def test_lru_evict_other_stores(monkeypatch):
    _mb(monkeypatch, 1.0)
    c = LRUBytesCache()
    c.put(("old", 0, "k"), "a", 100)
    c.put(("old", 1, "k"), "b", 100)
    c.put(("new", 0, "k"), "c", 100)
    c.evict_other_stores("new")
    assert len(c) == 1 and c.total_bytes == 100
    assert c.get(("new", 0, "k")) == "c"


def test_eviction_refetch_returns_identical_slices(spark, tmp_path, monkeypatch):
    """Cycle through more slices than the budget holds, twice: every
    re-read after eviction must decode to exactly the bytes the first
    read produced (refetch is a pure function of the immutable store),
    and evictions must actually happen — this is the policy that
    removed AUTO_BLOCKS_MAX_EDGES."""
    import gunrock_spark.engine.csr_blocks as cb
    from gunrock_spark.algorithms.triangles import _adjacency_csr
    from gunrock_spark.engine.csr_blocks import build_block_store, _load_block
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import edges_df, rmat_edges
    from tests.oracles import clean_edges

    edge_list = clean_edges(
        [(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=13)]
    )
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    store = build_block_store(g.edges, num_blocks=8, path=str(tmp_path / "store"))

    fresh = cb.LRUBytesCache()
    monkeypatch.setattr(cb, "_BLOCK_CACHE", fresh)
    # budget ~ one or two slices of this tiny store: force misses
    _mb(monkeypatch, 3e-3)  # 3000 bytes

    first = {b: _adjacency_csr(store, b) for b in range(8)}
    frames = {b: _load_block(store, b).copy() for b in range(8)}
    assert fresh.evictions > 0, "budget never forced an eviction"
    assert len(fresh) < 16  # never holding all (8 csr + 8 frame) entries

    for b in range(8):
        verts, indptr, dsts = _adjacency_csr(store, b)
        np.testing.assert_array_equal(verts, first[b][0])
        np.testing.assert_array_equal(indptr, first[b][1])
        np.testing.assert_array_equal(dsts, first[b][2])
        refetched = _load_block(store, b)
        assert refetched.equals(frames[b])
    assert fresh.misses > 16  # second pass refetched at least some
    # remove the store AND its node-shared published slices (tmp_path
    # auto-cleanup knows nothing about the shm cache dir)
    cb.remove_block_store(store, store)
    assert not os.path.isdir(cb._shm_store_dir(store) or "/nonexistent")


def test_blocks_tc_correct_under_tiny_cache_budget(spark, tmp_path, monkeypatch):
    """End-to-end: with a budget far below total-slices size the blocks
    triangle count still matches the wedge-join count. Workers spawned
    before the env change may hold the default budget, so also pin the
    driver-visible invariant via the fresh-cache test above; here the
    point is that a small budget can NEVER change the counted value."""
    from gunrock_spark.algorithms.triangles import triangle_count
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import edges_df, rmat_edges
    from tests.oracles import clean_edges

    _mb(monkeypatch, 1e-3)
    edge_list = clean_edges(
        [(int(s), int(d)) for s, d in rmat_edges(8, 8, seed=21)]
    )
    g = EdgeTable.from_df(edges_df(spark, edge_list))
    assert triangle_count(g, impl="blocks") == triangle_count(g, impl="join")
