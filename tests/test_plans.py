"""Physical-plan quality gates — the properties that make these
operators survive a 100x scale-up, pinned as regression tests.

Each test inspects `explain`-style plan text: column pruning reaching
the parquet scan (ReadSchema), no row-at-a-time Python UDFs in hot
paths (BatchEvalPython absent; ArrowEvalPython only where pandas UDFs
are the design), and whole-stage codegen presence.
"""

import pytest
from pyspark.sql import functions as F

from gunrock_spark.pipeline.dedup import exact_duplicates, simhash
from gunrock_spark.pipeline.text import token_stats
from gunrock_spark.sources.tables import derived_edges_df


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


SF = "/root/testdata/sf0.001"


def test_derived_edges_scan_prunes_columns(spark):
    plan = _plan(derived_edges_df(spark, SF))
    # the orders scan must read only the two key columns, not all six
    assert "o_orderkey" in plan and "o_custkey" in plan
    assert "o_totalprice" not in plan and "o_orderdate" not in plan


def test_token_stats_prunes_to_two_columns(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(token_stats(docs))
    assert "doc_id" in plan and "text" in plan
    # lang/source/n_chars must be pruned from the scan's ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "lang" not in read_schema[0] and "source" not in read_schema[0]


def test_no_python_udf_in_jvm_hot_paths(spark):
    """Dedup/text/graph hot paths are pure Catalyst — no
    BatchEvalPython (row-at-a-time) and no ArrowEvalPython either."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (exact_duplicates(docs), simhash(docs), token_stats(docs)):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_dedup_plan_is_one_exchange_with_partial_agg(spark):
    """exact dedup = scan -> project -> partial agg -> ONE exchange ->
    final agg. (With AQE the formatted plan wraps in AdaptiveSparkPlan
    and codegen markers only appear post-execution, so assert the
    structure itself.)"""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_duplicates(docs))
    tree = plan.split("\n\n")[0]  # the operator tree, not the details
    assert tree.count("Exchange") == 1
    assert tree.count("HashAggregate") == 2  # map-side partial + final


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.where(F.col("doc_id") < 10).select("doc_id")
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "LessThan(doc_id,10)" in pushed[0], plan


def test_pagerank_iteration_single_shuffle_agg(spark):
    """One PR step = join + ONE aggregate exchange on dst (map-side
    partial agg present: HashAggregate appears above and below the
    exchange)."""
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import G_TOY7, edges_df

    g = EdgeTable.from_df(edges_df(spark, G_TOY7))
    # state is localCheckpointed in the real loop (lineage cut) —
    # mirror that here; it also breaks the degrees/edges shared lineage
    state = (
        g.degrees.select("v", "out_degree", F.lit(0.1).alias("rank"))
        .localCheckpoint(eager=True)
    )
    contribs = (
        state.where(F.col("out_degree") > 0)
        .join(g.edges, state["v"] == g.edges["src"])
        .select(g.edges["dst"].alias("dst"), (F.col("rank") / F.col("out_degree")).alias("c"))
    )
    sums = contribs.groupBy("dst").agg(F.sum("c").alias("msg"))
    plan = _plan(sums)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan


def test_cc_iteration_reuses_symmetrized_layout(spark):
    """The CC hash-min join must NOT re-shuffle or re-sort the cached
    symmetrized edge table: its CSR-analog layout (hash by src + sort
    within partitions) satisfies the SortMergeJoin's requirement, so
    the edge side reads straight from InMemoryTableScan. Only the
    |V|-row state side pays an exchange per iteration."""
    from gunrock_spark.graph.edge_table import EdgeTable
    from gunrock_spark.graph.generators import edges_df, rmat_edges

    g = EdgeTable.from_df(
        edges_df(spark, [(int(s), int(d)) for s, d in rmat_edges(9, 8, seed=2)]),
        num_partitions=8,
    )
    sym = g.symmetrized().edges
    sym.count()  # materialize the cache, as the real loop does
    state = (
        g.vertices.select("v", F.col("v").alias("label"))
        .repartition(8, "v")
        .localCheckpoint(eager=True)
    )
    with_smj = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for k, v in with_smj.items():
            spark.conf.set(k, v)
        cand = (
            state.join(sym, state["v"] == sym["src"])
            .select(sym["dst"].alias("v"), F.col("label"))
            .groupBy("v")
            .agg(F.min("label").alias("nbr_min"))
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # operator tree above the cached relation: cut at InMemoryRelation
    # (the cache-build subtree legitimately contains its own exchanges)
    above_cache = plan.split("InMemoryRelation", 1)[0]
    lines = above_cache.splitlines()
    join_at = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    edge_side = "\n".join(lines[join_at:])
    # edge side (after the join node, state side is the first child
    # which carries its own Exchange+Sort): exactly one Exchange and
    # one Sort total above the cache — both belong to the state side
    assert edge_side.count("Exchange") == 1, plan
    assert edge_side.count("Sort ") == 1, plan
    assert "InMemoryTableScan" in edge_side, plan


def test_ivf_centroid_selection_no_global_sort(spark):
    """The centroid pick must be a parallel hash-threshold filter +
    TakeOrderedAndProject (per-partition top-k) — NEVER a global
    no-partition Window funneling the corpus through one task, and no
    shuffle exchange at all (VERDICT r1 'what's wrong' #1)."""
    from gunrock_spark.pipeline.similarity import _centroid_candidates

    embeds = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = _centroid_candidates(embeds, 16, "vec_id", "embedding", 8, 100_000)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in tree
    assert "Exchange" not in tree
