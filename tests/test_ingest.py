from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.graph.generators import pages_table, url_for
from gunrock_spark.ingest.links import pages_to_edges, verify_extraction


def test_text_extraction_byte_identical(spark):
    pages, _ = pages_table(spark, n_pages=64, edge_factor=4, seed=42)
    assert verify_extraction(pages) == 0


def test_recovered_edges_match_generator(spark):
    pages, true_edges = pages_table(spark, n_pages=64, edge_factor=4, seed=42)
    edges, dictionary = pages_to_edges(pages)
    # dictionary: urls sorted; our url scheme sorts identically to
    # vertex order (zero-padded), so id == original vertex id
    d = {r["url"]: r["v"] for r in dictionary.collect()}
    assert all(d[url_for(v)] == v for v in range(64))
    got = set((r["src"], r["dst"]) for r in edges.collect())
    assert got == set(true_edges)


def test_pages_to_edge_table_pipeline(spark):
    pages, true_edges = pages_table(spark, n_pages=32, edge_factor=4, seed=7)
    edges, _ = pages_to_edges(pages)
    g = EdgeTable.from_df(edges)
    # generator already drops self-loops and dedups per page
    assert g.num_edges() == len(set(true_edges))


def test_read_write_pages_roundtrip_and_validation(spark, tmp_path):
    from gunrock_spark.sources.pages import read_pages, write_pages

    pages, _ = pages_table(spark, n_pages=32, edge_factor=4, seed=7)
    path = str(tmp_path / "pages.parquet")
    write_pages(pages, path)
    back = read_pages(spark, path)
    assert back.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert back.count() == 32
    assert verify_extraction(back) == 0  # byte-identical through the roundtrip

    # catalog-table route (the Iceberg path once a catalog is conf'd):
    # a temp view stands in for the catalog entry — same spark.table call.
    pages.createOrReplaceTempView("pages_view")
    via_table = read_pages(spark, "pages_view")
    assert via_table.count() == 32

    # extra columns are pruned to the contract shape
    import pyspark.sql.functions as F

    wide = pages.withColumn("crawl_id", F.lit(3))
    wide.createOrReplaceTempView("pages_wide")
    assert read_pages(spark, "pages_wide").columns == list(back.columns)

    # wrong schema fails fast with a clear message
    import pytest as _pytest

    bad = pages.drop("html")
    bad.createOrReplaceTempView("pages_bad")
    with _pytest.raises(ValueError, match="html"):
        read_pages(spark, "pages_bad")


def test_write_pages_table_route_create_append_overwrite(spark):
    """The catalog-table write path (Iceberg route on a real catalog;
    the session catalog here): create, daily append, overwrite."""
    from gunrock_spark.sources.pages import read_pages, write_pages

    pages, _ = pages_table(spark, n_pages=32, edge_factor=4, seed=7)
    spark.sql("DROP TABLE IF EXISTS pages_rt")
    write_pages(pages, "pages_rt")                      # create
    assert read_pages(spark, "pages_rt").count() == 32
    write_pages(pages, "pages_rt", mode="append")       # incremental crawl
    assert read_pages(spark, "pages_rt").count() == 64
    write_pages(pages, "pages_rt", mode="overwrite")    # full refresh
    assert read_pages(spark, "pages_rt").count() == 32
    spark.sql("DROP TABLE pages_rt")


def test_warm_start_duplicate_init_rows_are_deduped(spark):
    """Duplicate v rows in init_ranks/init_labels must not fan out the
    state join (which would converge to wrong values silently)."""
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.algorithms.pagerank import pagerank
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_TOY7, edges_df

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    cold = pagerank(g, threshold=1e-7, max_iter=200)
    dup_ranks = cold.state.select("v", "rank").unionByName(
        cold.state.select("v", "rank")
    )
    warm = pagerank(g, threshold=1e-7, max_iter=200, init_ranks=dup_ranks)
    assert warm.state.count() == cold.state.count()
    c = {r["v"]: r["rank"] for r in cold.state.collect()}
    w = {r["v"]: r["rank"] for r in warm.state.collect()}
    assert all(abs(w[v] - c[v]) < 1e-6 for v in c)

    cc = connected_components(g)
    dup_labels = cc.state.select("v", "label").unionByName(
        cc.state.select("v", "label")
    )
    warm_cc = connected_components(g, init_labels=dup_labels)
    assert warm_cc.state.count() == cc.state.count()


def test_read_pages_bare_relative_dir_is_parquet(spark, tmp_path, monkeypatch):
    """A bare relative directory name that exists on the filesystem is
    a parquet path, not a catalog identifier (ADVICE regression)."""
    from gunrock_spark.graph.generators import pages_table
    from gunrock_spark.sources.pages import _infer_fmt, read_pages

    pages, _ = pages_table(spark, n_pages=8, seed=3)
    target = tmp_path / "bare_pages_dir"
    pages.write.parquet(str(target))
    monkeypatch.chdir(tmp_path)
    assert _infer_fmt("bare_pages_dir") == "parquet"
    assert read_pages(spark, "bare_pages_dir").count() == 8
    # unresolvable bare identifier: error mentions the fmt escape hatch
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fmt='parquet'"):
        read_pages(spark, "no_such_table_anywhere")


def test_anchor_text_rollup_matches_generator(spark):
    from collections import Counter

    from gunrock_spark.graph.generators import pages_table, url_for
    from gunrock_spark.ingest.links import anchor_text_rollup

    pages, true_edges = pages_table(spark, 32, seed=13)
    got = {
        (r.url, r.term): r.n_anchors for r in anchor_text_rollup(pages).collect()
    }
    # generator anchors are "anchor {k}" where k is the link's index
    # within its page — replicate driver-side
    want = Counter()
    per_src = {}
    for s, d in true_edges:
        k = per_src.setdefault(s, 0)
        per_src[s] += 1
        want[(url_for(d), "anchor")] += 1
        want[(url_for(d), str(k))] += 1
    assert got == dict(want)
