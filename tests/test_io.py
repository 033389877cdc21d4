"""Graph I/O: .mtx ingest (including the reference's own fixture
files), export round-trip, EdgeTable snapshot cache."""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import G_CC11, G_PR4, edges_df
from gunrock_spark.graph.io import (
    load_edge_table,
    read_mtx,
    save_edge_table,
    write_mtx,
)

REF_SMALL = "/root/reference/dataset/small"


def test_read_reference_test_pr_mtx(spark):
    """The reference's own 4-vertex PR fixture parses to exactly the
    golden edge list G_PR4 (re-encoded 0-based in generators.py)."""
    g = read_mtx(spark, f"{REF_SMALL}/test_pr.mtx")
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == set(G_PR4)
    assert not g.weighted


def test_read_reference_test_cc_mtx(spark):
    g = read_mtx(spark, f"{REF_SMALL}/test_cc.mtx")
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == set(G_CC11)


def test_read_symmetric_banner_emits_both_directions(spark, tmp_path):
    p = tmp_path / "sym.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 2\n"
        "2 1\n"
        "3 2\n"
    )
    g = read_mtx(spark, str(p))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(1, 0), (0, 1), (2, 1), (1, 2)}


def test_read_weighted_and_missing_value_fill(spark, tmp_path):
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 3\n"
        "1 2 5.5\n"
        "2 3 1.25\n"
        "3 1\n"  # missing value -> deterministic h60 fill % 64
    )
    g = read_mtx(spark, str(p))
    assert g.weighted
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert w[(0, 1)] == 5.5 and w[(1, 2)] == 1.25
    fill = w[(2, 0)]
    assert 0.0 <= fill < 64.0 and fill == int(fill)
    # deterministic across reads
    g2 = read_mtx(spark, str(p))
    assert {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}[(2, 0)] == fill


def test_write_read_roundtrip(spark, tmp_path):
    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    p = tmp_path / "out.mtx"
    write_mtx(g, str(p))
    g2 = read_mtx(spark, str(p))
    a = {(r["src"], r["dst"]) for r in g.edges.collect()}
    b = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert a == b


def test_snapshot_save_load(spark, tmp_path):
    g = EdgeTable.from_df(edges_df(spark, G_CC11))
    d = str(tmp_path / "snap")
    save_edge_table(g, d)
    g2 = load_edge_table(spark, d, num_partitions=4)
    assert g2.num_edges() == g.num_edges()
    assert g2.num_vertices() == g.num_vertices()
    a = {(r["src"], r["dst"]) for r in g.edges.collect()}
    b = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert a == b
    da = {r["v"]: (r["out_degree"], r["in_degree"]) for r in g.degrees.collect()}
    db = {r["v"]: (r["out_degree"], r["in_degree"]) for r in g2.degrees.collect()}
    assert da == db


def test_write_ligra_adj(spark, tmp_path):
    from gunrock_spark.graph.io import write_ligra_adj

    g = EdgeTable.from_df(edges_df(spark, G_PR4))
    p = tmp_path / "g.adj"
    write_ligra_adj(g, str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "AdjacencyGraph"
    n, m = int(lines[1]), int(lines[2])
    assert n == 4 and m == 8
    offsets = [int(x) for x in lines[3 : 3 + n]]
    cols = [int(x) for x in lines[3 + n :]]
    assert len(cols) == m and offsets[0] == 0
    # reconstruct edge set from CSR text
    offsets.append(m)
    got = {
        (v, cols[e])
        for v in range(n)
        for e in range(offsets[v], offsets[v + 1])
    }
    assert got == set(G_PR4)


def test_ligra_adj_roundtrip(spark, tmp_path):
    """write_ligra_adj -> read_ligra_adj recovers the exact edge set,
    including empty-adjacency vertices in the offset table."""
    import random

    from gunrock_spark.graph.io import read_ligra_adj, write_ligra_adj

    rng = random.Random(23)
    edges = sorted({(rng.randrange(80), rng.randrange(80)) for _ in range(400)})
    edges = [(s, d) for s, d in edges if s != d]
    g = EdgeTable.from_df(spark.createDataFrame(edges, "src long, dst long"))
    p = tmp_path / "rt.adj"
    write_ligra_adj(g, str(p))
    back = read_ligra_adj(spark, str(p))
    got = {(r.src, r.dst) for r in back.edges.collect()}
    assert got == set(edges)


def test_read_ligra_adj_rejects_non_adj(spark, tmp_path):
    import pytest as _pytest

    from gunrock_spark.graph.io import read_ligra_adj

    p = tmp_path / "bad.adj"
    p.write_text("NotAGraph\n1\n1\n0\n0\n")
    with _pytest.raises(ValueError):
        read_ligra_adj(spark, str(p))


def test_write_mtx_roundtrip_1m_edges(spark, tmp_path):
    """Distributed export at real size: ~1M-edge R-MAT graph written
    with the no-collect single-file writer, re-read, edge sets equal
    (VERDICT r1 next-round #6)."""
    from gunrock_spark.graph.generators import rmat_edges_df_distributed
    from gunrock_spark.graph.io import read_mtx, write_mtx

    df = rmat_edges_df_distributed(spark, scale=16, edge_factor=16, seed=4)
    g = EdgeTable.from_df(df, num_partitions=8)
    m = g.num_edges()
    assert m > 500_000
    p = tmp_path / "big.mtx"
    write_mtx(g, str(p))
    with open(p) as f:
        assert f.readline().startswith("%%MatrixMarket")
    back = read_mtx(spark, str(p))
    assert back.num_edges() == m
    # spot-check exact equality on a deterministic slice
    a = {(r["src"], r["dst"]) for r in g.edges.where(F.col("src") % 997 == 0).collect()}
    b = {(r["src"], r["dst"]) for r in back.edges.where(F.col("src") % 997 == 0).collect()}
    assert a == b


def test_clustered_edge_store_prunes_partitions(spark, tmp_path):
    """Community-bucketed edge store (cluster-partitioner analog):
    a community-restricted read returns exactly that community's
    out-edges and prunes bucket directories at the partition level."""
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.graph.io import read_clustered_edges, save_edge_table_clustered

    # two disjoint components
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (12, 11)]
    g = EdgeTable.from_df(edges_df(spark, edges))
    labels = connected_components(g).state.select("v", "label")
    path = str(tmp_path / "clustered")
    save_edge_table_clustered(g, labels, path, num_buckets=8)
    lab = {r["v"]: r["label"] for r in labels.collect()}
    c0 = lab[0]
    got = read_clustered_edges(spark, path, community=c0, num_buckets=8)
    assert {(r["src"], r["dst"]) for r in got.collect()} == {
        (s, d) for s, d in edges if lab[s] == c0
    }
    # the cbucket predicate must appear as a partition filter (pruning
    # happens before the scan), and the label filter must be pushed
    plan = got._jdf.queryExecution().explainString(
        got._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "cbucket" in pf, plan
    # full read returns everything
    assert read_clustered_edges(spark, path).count() == len(edges)


def test_snap_edge_list_roundtrip_and_comments(spark, tmp_path):
    """write_snap_edges -> read_snap_edges recovers the exact cleaned
    edge set; the reader skips #-comment lines, mixed whitespace, and
    parses optional weights."""
    from gunrock_spark.graph.generators import rmat_edges_df
    from gunrock_spark.graph.io import read_snap_edges, write_snap_edges
    from gunrock_spark.graph.edge_table import EdgeTable

    df = rmat_edges_df(spark, scale=8, edge_factor=4, seed=9)
    g = EdgeTable.from_df(df)
    want = {(r["src"], r["dst"]) for r in g.edges.collect()}
    p = str(tmp_path / "snap_out")
    write_snap_edges(g, p)
    back = read_snap_edges(spark, p)
    got = {(r["src"], r["dst"]) for r in back.edges.collect()}
    assert got == want

    # hand-written file: comments, blank lines, tabs/spaces, weights
    f = tmp_path / "hand.txt"
    f.write_text(
        "# Directed graph\n# src\tdst\tw\n\n0\t1\t2.5\n1  2  0.5\n2\t0\t1.0\n"
    )
    gw = read_snap_edges(spark, str(f), weighted=True)
    rows = {(r["src"], r["dst"]): r["weight"] for r in gw.edges.collect()}
    assert rows == {(0, 1): 2.5, (1, 2): 0.5, (2, 0): 1.0}


def test_snap_weighted_write_read_roundtrip(spark, tmp_path):
    """A WEIGHTED write_snap_edges -> read_snap_edges round-trip keeps
    the weight column (ADVICE r4: weights were silently dropped)."""
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.io import read_snap_edges, write_snap_edges

    df = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 0.5), (2, 0, 1.0)],
        schema="src long, dst long, weight double",
    )
    g = EdgeTable.from_df(df, weight="weight")
    p = str(tmp_path / "snap_w")
    write_snap_edges(g, p)
    back = read_snap_edges(spark, p, weighted=True)
    rows = {(r["src"], r["dst"]): r["weight"] for r in back.edges.collect()}
    assert rows == {(0, 1): 2.5, (1, 2): 0.5, (2, 0): 1.0}


def test_sharded_mtx_export_concat_equals_single_file(spark, tmp_path):
    """write_mtx_sharded writes N range-ordered parts + _MANIFEST.json
    whose filename-order concatenation is byte-identical to the
    single-file write_mtx output (VERDICT r4 #4)."""
    import glob
    import json as _json

    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df
    from gunrock_spark.graph.io import write_mtx, write_mtx_sharded

    g = EdgeTable.from_df(rmat_edges_df(spark, scale=10, edge_factor=8, seed=3))
    single = str(tmp_path / "g.mtx")
    write_mtx(g, single)
    shard_dir = str(tmp_path / "g_mtx_shards")
    write_mtx_sharded(g, shard_dir, num_shards=8)

    man = _json.load(open(shard_dir + "/_MANIFEST.json"))
    assert man["format"] == "mtx" and man["num_shards"] == 8
    assert man["num_edges"] == g.num_edges()
    parts = sorted(glob.glob(shard_dir + "/part-*"))
    assert len(parts) == 8
    concat = b"".join(open(p, "rb").read() for p in parts)
    assert concat == open(single, "rb").read()


def test_sharded_ligra_export_concat_equals_single_file(spark, tmp_path):
    """write_ligra_adj_sharded (distributed two-level-scan offsets)
    concatenates to the exact single-file AdjacencyGraph stream."""
    import glob

    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import rmat_edges_df
    from gunrock_spark.graph.io import write_ligra_adj, write_ligra_adj_sharded

    g = EdgeTable.from_df(rmat_edges_df(spark, scale=9, edge_factor=6, seed=4))
    single = str(tmp_path / "g.adj")
    write_ligra_adj(g, single)
    shard_dir = str(tmp_path / "g_adj_shards")
    write_ligra_adj_sharded(g, shard_dir, num_shards=5)
    parts = sorted(glob.glob(shard_dir + "/part-*"))
    assert len(parts) == 5
    concat = b"".join(open(p, "rb").read() for p in parts)
    assert concat == open(single, "rb").read()


def test_single_file_export_guard_refuses_oversized(spark, tmp_path, monkeypatch):
    """Above MAX_SINGLE_FILE_ROWS the single-file writers refuse with
    a pointer at the sharded variant."""
    import pytest

    import gunrock_spark.graph.io as gio
    from gunrock_spark.graph.edge_table import EdgeTable

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], schema="src long, dst long"
    )
    g = EdgeTable.from_df(df)
    monkeypatch.setattr(gio, "MAX_SINGLE_FILE_ROWS", 3)
    with pytest.raises(ValueError, match="write_mtx_sharded"):
        gio.write_mtx(g, str(tmp_path / "refuse.mtx"))
    with pytest.raises(ValueError, match="write_ligra_adj_sharded"):
        gio.write_ligra_adj(g, str(tmp_path / "refuse.adj"))
