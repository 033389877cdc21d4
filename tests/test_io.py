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
