"""Connected components — hash-min label propagation + pointer jumping.

Re-creates the semantics of the reference's Soman-style hooking /
pointer-jumping CC (gunrock/app/cc/): component id of every vertex =
the MINIMUM vertex id in its (weakly) connected component
(hook min wins: cc_functor.cuh:179-193,427-462; pointer jumping
cid[v]=cid[cid[v]]: cc_functor.cuh:544-560). Output matches exactly.

Spark plan per iteration (SURVEY.md §2.2 CC row):
  1. hash-min over the symmetrized edge table:
       cand = labels ⋈ edges on v=src -> (dst, label)
       nbr_min = groupBy(dst).min(label);  new = min(own, nbr_min)
     (the analog of HookMax over every edge, via ALL_EDGES advance)
  2. pointer jump: label(v) := label(label(v)) via a self-join of the
     label table — the reference's jump loop, collapsed to one join per
     outer iteration; gives O(log diameter) rounds on long chains.
  3. stop when no label changed (vertex_flag/edge_flag analog).

At web scale the label table is |V|-sized; both joins shuffle only
|V| + |E| rows and map-side partial min absorbs dst skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.checkpoint import CheckpointManager
from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def connected_components(
    graph: EdgeTable,
    max_iter: int = 100,
    pointer_jump: bool | int = True,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    init_labels: DataFrame | None = None,
    skew: object = "auto",
) -> IterationResult:
    """Weakly connected components. State: (v long, label long, prev long);
    converged label = min vertex id in the component.

    ``init_labels`` warm-starts from a previous run's ``(v, label)``
    table after an ADDITIVE graph update (new vertices/edges from an
    incremental ingest): hash-min converges from any labeling that is
    a per-vertex upper bound on the true component minimum, and old
    labels stay upper bounds when edges are only added (merges can
    only lower the minimum). Vertices absent from ``init_labels``
    start at their own id. NOT valid after edge deletions — splits
    would need labels to GROW, which hash-min cannot do; re-run cold.
    """
    spark = graph.edges.sparkSession
    edges = graph.symmetrized().edges  # undirected view, both directions

    # Hub hardening ("skew": same contract as pagerank — "auto"
    # gates on the degree histogram, False disables, a list forces
    # the hot set): hub sources' hash-min edges go through a
    # broadcast tier so one reducer never receives a mega-hub's whole
    # adjacency. The undirected hub degree is bounded by out+in of
    # the directed table, so the cached degree table gates without an
    # extra |E| pass.
    hot_ids: list[int] = []
    hot_edges = cold_edges = None
    if skew:
        from gunrock_spark.engine.skew import detect_hot_vertices, split_hot_edges

        if skew == "auto":
            sym_deg = graph.degrees.select(
                "v", (F.col("out_degree") + F.col("in_degree")).alias("deg")
            )
            hot_ids = detect_hot_vertices(
                sym_deg,
                "deg",
                n_edges=2 * graph.num_edges(),  # symmetrized upper bound
                num_partitions=spark.sparkContext.defaultParallelism,
            )
        else:
            hot_ids = list(skew)
        if hot_ids:
            hot_edges, cold_edges = split_hot_edges(edges, hot_ids, "src")

    state = graph.vertices.select("v", F.col("v").alias("label"))
    if init_labels is not None:
        # Dedup on v (duplicate rows would fan out the join into
        # duplicate state rows); min() of candidate labels stays a
        # valid upper bound.
        warm = init_labels.groupBy(F.col("v").alias("wv")).agg(
            F.min("label").alias("warm_label")
        )
        state = state.join(warm, state["v"] == warm["wv"], "left").select(
            "v", F.coalesce("warm_label", F.col("label")).alias("label")
        )
    state = state.repartition(
        spark.sparkContext.defaultParallelism, "v"
    ).localCheckpoint(eager=True)

    checkpointer = None
    start_iter, prior_metrics = 0, None
    if checkpoint_dir is not None:
        checkpointer = CheckpointManager(
            checkpoint_dir,
            # Graph identity in the hash: resuming a snapshot from a
            # DIFFERENT graph (e.g. after an incremental ingest grew
            # the edge table) must be refused, not silently returned
            # as already-converged.
            config={
                "algorithm": "connected_components",
                "n_vertices": graph.num_vertices(),
                "n_edges": graph.num_edges(),
            },
        )
        if resume:
            loaded = checkpointer.load_latest(spark)
            if loaded is not None:
                state, start_iter, prior_metrics = loaded
                state = state.select("v", "label")

    # holds the previous iteration's mid-step snapshot so it can be
    # released once the next iteration no longer references it
    mid_state: dict = {"df": None}

    def step(cur: DataFrame, i: int):
        cur = cur.select("v", "label")
        # 1. hash-min over neighbors (edges symmetric -> both directions)
        if hot_ids:
            from gunrock_spark.engine.skew import skewed_state_edge_join

            gathered = skewed_state_edge_join(
                cur, hot_edges, cold_edges, hot_ids, "v", "src"
            ).select(F.col("dst").alias("nv"), F.col("label"))
        else:
            gathered = cur.join(edges, cur["v"] == edges["src"]).select(
                edges["dst"].alias("nv"), F.col("label")
            )
        cand = (
            gathered.groupBy(F.col("nv").alias("v"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new = cur.withColumnRenamed("label", "prev").join(cand, "v", "left").select(
            "v", F.least(F.col("prev"), F.coalesce("nbr_min", F.col("prev"))).alias("label"), "prev"
        )
        # 2. pointer jump: label := label'(label) — true pointer
        # doubling needs the parent map to be the FRESH hash-min
        # result itself (Wyllie jumping squares the contraction only
        # when jumping through the current mapping; jumping through
        # the previous iteration's map — even repeatedly — adds a
        # constant chain length and measured ZERO iteration savings,
        # see BENCH.md §3a-r4). A lazy self-join on the UNCACHED
        # hash-min result would recompute the |E|-row join+agg twice
        # (the two exchange children canonicalize differently, so
        # Catalyst cannot reuse them — the r2 shape). r4 fixed that
        # with an EAGER mid-step localCheckpoint (one extra action per
        # iteration); r5 replaces it with a lazy persist(): both jump
        # references resolve to the SAME InMemoryRelation, so when the
        # iteration's single metrics action runs, the BlockManager
        # computes each hash-min partition once (getOrElseUpdate block
        # locking) and the jump reads the cache — one |E|-row hash-min
        # + one |V|-row self-join per iteration, ONE action total
        # (job-count pinned in tests/test_components.py).
        #   pointer_jump=True  -> cached mid-step + self-jump
        #   pointer_jump=int n -> n cheap jumps through the PREVIOUS
        #                         materialized state (no extra action)
        #   pointer_jump=False -> pure hash-min
        if pointer_jump is True:
            mid = new.persist()
            if mid_state["df"] is not None:
                try:
                    mid_state["df"].unpersist()
                except Exception:
                    pass
            mid_state["df"] = mid
            parents = mid.select(F.col("v").alias("pv"), F.col("label").alias("plabel"))
            new = (
                mid.join(parents, mid["label"] == parents["pv"], "left")
                .select(
                    "v",
                    F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
                    "prev",
                )
            )
        elif pointer_jump:
            parents = cur.select(F.col("v").alias("pv"), F.col("label").alias("plabel"))
            for _ in range(int(pointer_jump)):
                new = (
                    new.join(parents, new["label"] == parents["pv"], "left")
                    .select(
                        "v",
                        F.least(
                            F.col("label"), F.coalesce("plabel", "label")
                        ).alias("label"),
                        "prev",
                    )
                )

        def metrics(materialized: DataFrame) -> dict:
            changed = materialized.where(F.col("label") != F.col("prev")).count()
            return {"changed": changed, "edges_traversed": graph.num_edges()}

        return new, metrics

    result = iterate(
        state,
        step,
        stop=lambda m: m["changed"] == 0,
        max_iter=max_iter,
        checkpointer=checkpointer,
        checkpoint_interval=checkpoint_interval,
        start_iteration=start_iter,
        prior_metrics=prior_metrics,
    )
    if mid_state["df"] is not None:
        try:
            mid_state["df"].unpersist()
        except Exception:
            pass
    for split in (hot_edges, cold_edges):
        if split is not None:
            try:
                split.unpersist()
            except Exception:
                pass
    return result


def component_sizes(labels: DataFrame) -> DataFrame:
    """(label, n_vertices) per component — the reference's component
    count diagnostic (num components = distinct roots)."""
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_vertices"))


def induced_subgraph(graph: EdgeTable, vertices: DataFrame) -> EdgeTable:
    """Edge table induced by a vertex set: edges with BOTH endpoints
    in ``vertices`` (DataFrame whose first column is the vertex id).
    Two semi-joins against the edge table — the vertex side shuffles,
    the (100 TB) edge side streams through its existing partitioning;
    AQE broadcasts the vertex set when it is small."""
    vs = vertices.select(F.col(vertices.columns[0]).cast("long").alias("v"))
    e = (
        graph.edges.join(vs.withColumnRenamed("v", "src"), "src", "left_semi")
        .join(vs.withColumnRenamed("v", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )
    return EdgeTable.from_df(e)


def giant_component(
    graph: EdgeTable, labels: DataFrame | None = None
) -> tuple[int, DataFrame]:
    """(label, vertices) of the largest weakly connected component
    (ties broken by smallest label — deterministic). ``labels`` lets
    callers reuse an existing connected_components run. The argmax is
    a bounded min(struct) over the |components|-row size table — never
    a global sort of the vertex table."""
    if labels is None:
        labels = connected_components(graph).state
    sizes = component_sizes(labels)
    top = sizes.agg(
        F.min(F.struct((-F.col("n_vertices")).alias("neg"), F.col("label"))).alias("t")
    ).collect()[0]["t"]
    label = int(top["label"])
    return label, labels.where(F.col("label") == label).select("v")


def giant_component_summary(
    graph: EdgeTable, labels: DataFrame | None = None
) -> DataFrame:
    """One row (label, n_vertices, n_edges): the largest component and
    the directed edge count of its induced subgraph — the standard
    web-graph "how big is the core blob" diagnostic (the WCC half of
    the Broder bowtie, algorithms/scc.py)."""
    spark = graph.edges.sparkSession
    label, verts = giant_component(graph, labels)
    n_vertices = verts.count()
    n_edges = induced_subgraph(graph, verts).edges.count()
    return spark.createDataFrame(
        [(label, n_vertices, n_edges)],
        schema="label long, n_vertices long, n_edges long",
    )
