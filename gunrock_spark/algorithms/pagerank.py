"""PageRank — synchronous push PR matching the reference semantics.

Re-creates (from scratch, DataFrame-first) the math of the reference's
normalized PageRank:
  - init rank = 1/n (normalized) or 1.0 (scaled)
    (gunrock/app/pr/pr_problem.cuh:397-423)
  - per iteration over ALL vertices (pr_enactor.cuh:475,504-533):
      new(v) = reset + delta * sum_{u->v} rank(u)/out_degree(u)
    with reset = (1-delta)/n normalized, (1-delta) scaled
    (pr_functor.cuh:209-226); 0-out-degree vertices contribute nothing
    (tests/pr/test_pr.cu:404-408) unless ``compensate``.
  - per-vertex convergence: vertex still active iff
    |new - old| > threshold * old (pr_functor.cuh:225); the run stops
    when NO vertex is active (Stop_Condition, pr_enactor.cuh:846-876)
    or iteration count exceeds max_iter.
  - ``compensate`` (dangling handling, tests/pr/test_pr.cu:566-618):
    add virtual sink vertex n; every 0-out-degree vertex gets one edge
    -> sink, sink gets an edge -> every original vertex; n becomes n+1.
    Implemented here WITHOUT materializing the |V| sink edges: the sink
    is one extra state row, danglers route their whole rank to it, and
    its uniform contribution is a broadcast scalar column.

Spark plan per iteration (SURVEY.md §2.2 PR row):
  state(v, out_degree, rank)  ⋈  edges on v = src     [shuffle or
      broadcast join — AQE decides; edges pre-partitioned by src]
  -> select(dst, rank/out_degree)
  -> groupBy(dst).sum          [map-side partial agg absorbs power-law
      dst skew; AQE skew handling for the join side]
  -> state left-join sums on v = dst -> new rank + per-vertex delta.
Each iteration is localCheckpointed (lineage cut) and optionally
snapshotted for resume via CheckpointManager.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.checkpoint import CheckpointManager
from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable

SINK = -1  # virtual dangling sink vertex id (reference uses id n)


def pagerank(
    graph: EdgeTable,
    delta: float = 0.85,
    threshold: float = 0.01,
    max_iter: int = 50,
    normalized: bool = True,
    compensate: bool = False,
    src: int | None = None,
    seed_set: list[int] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    impl: str = "join",
    init_ranks: DataFrame | None = None,
    skew: object = "auto",
) -> IterationResult:
    """Run PageRank to convergence. Result state schema:
    (v long, out_degree long, rank double, prev double); final ranked
    output via :func:`ranked` (rank desc, v asc — the reference's
    stable sort, tests/pr/test_pr.cu:455-456).

    The returned ``IterationResult.state`` EXCLUDES the virtual sink
    row when ``compensate`` is set (matching the reference, which
    reports n+1 nodes; we report the original vertices — callers
    wanting the sink use the raw loop).

    ``impl`` selects the physical strategy for the advance+reduce:
      - "join" (default): state ⋈ edges sort-merge/broadcast join +
        JVM hash aggregate (whole-stage codegen end to end).
      - "blocks": per-partition CSR-block gather-scatter via Arrow
        ``applyInPandas`` (engine/csr_blocks.py) — the north-star's
        pandas-UDF sparse gather-scatter path. CSR slices are written
        to a block store once and cached inside the Python workers;
        only the |V|-row state crosses Arrow per iteration. Same
        math, same results (float64, ULP-order noise only).

    ``init_ranks`` warm-starts the power iteration from a previous
    run's ``(v, rank)`` table — the continuous-crawl workflow: after
    an incremental ingest updates the edge table, restart from
    yesterday's converged ranks. For ``delta < 1`` the fixed point is
    unique, so the warm start changes ONLY the iteration count, never
    the converged values; vertices absent from ``init_ranks`` (newly
    crawled pages) start at the cold-start init value. The iteration
    savings are large for small perturbations (unchanged graph: 1
    round; few edges changed: a handful) and shrink as the update
    grows — doubling the corpus moves the fixed point enough that the
    stale vector is no better than uniform init.

    ``skew``: power-law hub hardening for the per-iteration
    state ⋈ edges join (engine/skew.py — the reference's TWC
    degree-tier analog). "auto" (default) detects hub sources from
    the cached degree table (max/mean gate) and, when hubs exist,
    routes their edges through a broadcast tier so no single reducer
    receives a 10^7-out-degree key; False disables; a list of vertex
    ids forces that hot set (tests). Results are identical either
    way — only the physical join strategy changes.
    """
    if src is not None and seed_set is not None:
        raise ValueError("pass src OR seed_set, not both")
    if seed_set is not None and len(seed_set) == 0:
        raise ValueError("seed_set must be non-empty")
    spark = graph.edges.sparkSession
    edges = graph.edges
    n_real = graph.num_vertices()

    if n_real == 0:
        from gunrock_spark.engine.iterate import IterationResult as _IR

        empty = spark.createDataFrame(
            [], schema="v long, out_degree long, rank double, prev double"
        )
        return _IR(state=empty, iterations=0, converged=True)

    has_dangling = compensate and graph.degrees.where(F.col("out_degree") == 0).limit(1).count() > 0
    n = n_real + 1 if has_dangling else n_real
    reset = (1.0 - delta) / n if normalized else (1.0 - delta)
    init = 1.0 / n if normalized else 1.0

    state = graph.degrees.select(
        "v", "out_degree", F.lit(float(init)).alias("rank")
    )
    if init_ranks is not None:
        # Dedup defensively: a duplicate v in init_ranks would fan out
        # the left join into duplicate state rows, and the loop would
        # converge to the wrong fixed point with no error. min() keeps
        # the guard deterministic.
        warm = init_ranks.groupBy(F.col("v").alias("wv")).agg(
            F.min("rank").alias("warm_rank")
        )
        state = (
            state.join(warm, state["v"] == warm["wv"], "left")
            .select(
                "v",
                "out_degree",
                F.coalesce("warm_rank", F.lit(float(init))).alias("rank"),
            )
        )
    if has_dangling:
        sink = spark.createDataFrame(
            [(SINK, n_real, float(init))], schema="v long, out_degree long, rank double"
        )
        state = state.unionByName(sink)
    state = state.repartition(spark.sparkContext.defaultParallelism, "v").localCheckpoint(eager=True)

    checkpointer = None
    start_iter, prior_metrics = 0, None
    if checkpoint_dir is not None:
        checkpointer = CheckpointManager(
            checkpoint_dir,
            # max_iter deliberately EXCLUDED: it's an operational
            # limit, not semantics — resuming a killed run with a
            # higher budget must be allowed (kill/extend workflow).
            config={
                "algorithm": "pagerank",
                "delta": delta,
                "threshold": threshold,
                "normalized": normalized,
                "compensate": compensate,
                "src": src,
                "n": n,
                # graph identity: |V| alone can collide across
                # different edge tables (see components.py note)
                "m": graph.num_edges(),
            },
        )
        if resume:
            loaded = checkpointer.load_latest(spark)
            if loaded is not None:
                state, start_iter, prior_metrics = loaded

    hot_ids: list[int] = []
    hot_edges = cold_edges = None
    if skew and impl == "join":
        from gunrock_spark.engine.skew import detect_hot_vertices, split_hot_edges

        hot_ids = (
            detect_hot_vertices(
                graph.degrees,
                "out_degree",
                n_edges=graph.num_edges(),
                num_partitions=spark.sparkContext.defaultParallelism,
            )
            if skew == "auto"
            else list(skew)
        )
        if hot_ids:
            hot_edges, cold_edges = split_hot_edges(edges, hot_ids, "src")

    block_store = None
    block_store_cleanup = None
    if impl == "blocks":
        import tempfile
        import uuid

        from gunrock_spark.engine.csr_blocks import (
            build_block_store,
            gather_scatter_sums,
            remove_block_store,
        )

        num_blocks = spark.sparkContext.defaultParallelism
        # local mode: a tmp dir; on a cluster pass a shared path via
        # SPARK_GRAFT_BLOCK_STORE (all executors must see it). Either
        # way the store lives in a UNIQUE per-build subdirectory: the
        # worker-local _BLOCK_CACHE is keyed by path and never
        # invalidated (immutable-store contract), so re-running
        # pagerank on an UPDATED graph in the same application (the
        # incremental-ingest warm-start workflow) must never reuse a
        # path — a fixed path would serve stale CSR slices from
        # long-lived Python workers and silently produce wrong ranks.
        import os as _os

        base = _os.environ.get("SPARK_GRAFT_BLOCK_STORE")
        tmp_base = tempfile.mkdtemp(prefix="csr_blocks_") if base is None else None
        store_path = (base or tmp_base).rstrip("/") + "/" + uuid.uuid4().hex
        block_store_cleanup = tmp_base or store_path
        block_store = build_block_store(edges, num_blocks, store_path)
    elif impl != "join":
        raise ValueError(f"unknown impl {impl!r} (expected 'join' or 'blocks')")

    # Compensate mode's sink scalar lives in DRIVER loop state: the
    # sink's rank is read out of each iteration's single metrics
    # action (see ``metrics`` below) instead of a dedicated 1-row
    # collect job per iteration (VERDICT r4 #9). Cold start: the sink
    # row is created with rank=init; resume: one setup collect
    # recovers it from the loaded snapshot.
    sink_state = {"uniform": 0.0}
    if has_dangling:
        if start_iter > 0 or prior_metrics is not None:
            row = state.where(F.col("v") == SINK).select("rank").collect()
            sink_state["uniform"] = (
                row[0]["rank"] / n_real if row else 0.0
            )
        else:
            sink_state["uniform"] = float(init) / n_real

    def step(cur: DataFrame, i: int):
        # Contributions along real edges: rank/out_degree pushed to dst.
        pushers = cur.where((F.col("out_degree") > 0) & (F.col("v") != SINK))
        if block_store is not None:
            contrib_state = pushers.select(
                "v", (F.col("rank") / F.col("out_degree")).alias("contrib")
            )
            sums = gather_scatter_sums(block_store, contrib_state, "contrib", num_blocks)
        elif hot_ids:
            from gunrock_spark.engine.skew import skewed_state_edge_join

            contribs = skewed_state_edge_join(
                pushers.select("v", "rank", "out_degree"),
                hot_edges,
                cold_edges,
                hot_ids,
                "v",
                "src",
            ).select(
                "dst", (F.col("rank") / F.col("out_degree")).alias("contrib")
            )
        else:
            contribs = (
                pushers.join(edges, pushers["v"] == edges["src"])
                .select(
                    edges["dst"].alias("dst"),
                    (F.col("rank") / F.col("out_degree")).alias("contrib"),
                )
            )
        sink_uniform = 0.0
        if has_dangling:
            # danglers' single edge -> sink: whole rank to SINK
            dangle = cur.where((F.col("out_degree") == 0) & (F.col("v") != SINK)).select(
                F.lit(SINK).cast("long").alias("dst"), F.col("rank").alias("contrib")
            )
            # sink -> every original vertex: uniform rank/n_real,
            # embedded as a LITERAL — a crossJoin(broadcast(...)) here
            # looks cheaper but its cardinality estimate compounds
            # through the checkpointed plan every iteration until
            # Catalyst's BigInteger size arithmetic overflows
            # (~iteration 25). The scalar itself is carried in driver
            # loop state (sink_state), refreshed by the PREVIOUS
            # iteration's metrics action — no per-iteration collect.
            sink_uniform = sink_state["uniform"]
            if block_store is not None:
                sums = (
                    sums.unionByName(
                        dangle.withColumnRenamed("contrib", "msg")
                    )
                    .groupBy("dst")
                    .agg(F.sum("msg").alias("msg"))
                )
            else:
                contribs = contribs.unionByName(dangle)
        if block_store is None:
            sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("msg"))
        new = (
            cur.select("v", "out_degree", F.col("rank").alias("prev"))
            .join(sums, F.col("v") == F.col("dst"), "left")
            .drop("dst")
        )
        if has_dangling:
            # sink itself receives no uniform share (reference sink
            # has no self-edge)
            new = new.withColumn(
                "msg",
                F.coalesce("msg", F.lit(0.0))
                + F.when(F.col("v") != SINK, F.lit(sink_uniform)).otherwise(F.lit(0.0)),
            )
        # personalized mode (src set): the whole (1-delta) reset mass
        # lands on src — wtf_functor.cuh:119's
        # (1-delta) * [src_node == node || src_node == -1] term.
        # seed_set generalizes it to a SEED SET with the mass split
        # evenly (TrustRank, Gyongyi et al. VLDB 2004 — the biased
        # PageRank d * T * t + (1-d) * τ with τ uniform over seeds).
        if seed_set is not None:
            share = (1.0 - delta) / len(seed_set)
            reset_col = (
                F.when(F.col("v").isin([int(s) for s in seed_set]), F.lit(share))
                .otherwise(F.lit(0.0))
            )
        elif src is not None:
            reset_col = (
                F.when(F.col("v") == src, F.lit(1.0 - delta)).otherwise(F.lit(0.0))
            )
        else:
            reset_col = F.lit(reset)
        new = new.select(
            "v",
            "out_degree",
            (reset_col + F.lit(delta) * F.coalesce("msg", F.lit(0.0))).alias("rank"),
            "prev",
        )

        def metrics(materialized: DataFrame) -> dict:
            # ONE action per iteration: the active count and (in
            # compensate mode) the sink's new rank come out of the
            # same aggregate over the materialized snapshot.
            agg_cols = [
                F.count(
                    F.when(
                        F.abs(F.col("rank") - F.col("prev"))
                        > threshold * F.col("prev"),
                        True,
                    )
                ).alias("active")
            ]
            if has_dangling:
                agg_cols.append(
                    F.max(
                        F.when(F.col("v") == SINK, F.col("rank"))
                    ).alias("sink_rank")
                )
            row = materialized.agg(*agg_cols).collect()[0]
            if has_dangling:
                sink_state["uniform"] = (row["sink_rank"] or 0.0) / n_real
            return {
                "active": int(row["active"]),
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    result = iterate(
        state,
        step,
        stop=lambda m: m["active"] == 0,
        max_iter=max_iter,
        checkpointer=checkpointer,
        checkpoint_interval=checkpoint_interval,
        start_iteration=start_iter,
        prior_metrics=prior_metrics,
    )
    if block_store_cleanup is not None:
        from gunrock_spark.engine.csr_blocks import remove_block_store

        remove_block_store(block_store_cleanup, block_store)
    for split in (hot_edges, cold_edges):
        if split is not None:
            try:
                split.unpersist()
            except Exception:
                pass
    if has_dangling:
        result.state = result.state.where(F.col("v") != SINK)
    return result


def trustrank(
    graph: EdgeTable,
    seeds: list[int],
    delta: float = 0.85,
    threshold: float = 0.01,
    max_iter: int = 50,
    **kw,
) -> IterationResult:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004): the
    biased PageRank whose (1-delta) teleport mass is split evenly over
    a trusted SEED SET instead of all pages — trust flows out of the
    seeds along links and decays with distance, the standard web-spam
    demotion signal. Same per-iteration plan as pagerank (one
    co-partitioned join + partial-agg sum); the seed test compiles to
    an InSet literal filter, no extra join, because real trust seed
    sets are driver-sized (hundreds of hand-audited sites)."""
    return pagerank(
        graph,
        delta=delta,
        threshold=threshold,
        max_iter=max_iter,
        seed_set=[int(s) for s in seeds],
        **kw,
    )


def spam_mass(
    graph: EdgeTable,
    seeds: list[int],
    delta: float = 0.85,
    max_iter: int = 8,
    **kw,
) -> DataFrame:
    """Relative spam mass (Gyongyi, Berkhin, Garcia-Molina & Pedersen,
    "Link Spam Detection Based on Mass Estimation", VLDB 2006): the
    fraction of a page's PageRank that does NOT flow from a trusted
    good core. q(p) is ordinary normalized PageRank; q'(p) is the
    core-biased estimate — the biased power iteration whose teleport
    vector puts 1/n on each good-core seed and 0 elsewhere (i.e.
    TrustRank's result scaled by |seeds|/n, by linearity of the
    iteration in the teleport vector). Relative mass

        rel_mass(p) = (q(p) - q'(p)) / q(p)

    is ~1 for pages whose rank is entirely non-core-attributable
    (spam-farm shape) and <= 0 for the core's own neighborhood. Both
    power iterations run the SAME fixed iteration count so the two
    partial sums are comparable (the paper's estimator truncates both
    Neumann series at the same depth).

    Physical plan: two pagerank runs (each one co-partitioned join +
    partial-agg sum per iteration, scale-safe at 10^12 vertices) plus
    a single |V|⋈|V| join on v — both sides hash-partitioned on v by
    the loops' state repartition, so the final join is shuffle-light.
    q(p) >= (1-delta)/n > 0 for every vertex, so the division is safe.
    """
    n = graph.num_vertices()
    pr = pagerank(
        graph, delta=delta, threshold=0.0, max_iter=max_iter, **kw
    ).state
    tr = trustrank(
        graph, seeds, delta=delta, threshold=0.0, max_iter=max_iter, **kw
    ).state
    scale = float(len(seeds)) / float(n)
    return (
        pr.select("v", F.col("rank").alias("pr"))
        .join(tr.select("v", F.col("rank").alias("tr")), "v")
        .select(
            "v",
            F.col("pr"),
            (
                (F.col("pr") - F.lit(scale) * F.col("tr")) / F.col("pr")
            ).alias("rel_mass"),
        )
    )


def weighted_pagerank(
    graph: EdgeTable,
    delta: float = 0.85,
    threshold: float = 0.01,
    max_iter: int = 50,
    normalized: bool = True,
) -> IterationResult:
    """PageRank over a WEIGHTED edge table (e.g. the host graph's
    n_links weights, ingest/hosts.py): each vertex pushes
    rank * w(u,v) / wout(u) instead of rank / out_degree(u), where
    wout is the weighted out-degree. With uniform weights this reduces
    exactly to :func:`pagerank`. Zero-weighted-out-degree vertices
    contribute nothing (same dangling rule as the unweighted default).

    State: (v long, wout double, rank double, prev double). Same
    physical plan as the join impl of :func:`pagerank` — one
    co-partitioned join + map-side-combined sum per iteration; the
    weight rides along the already-shuffled edge rows, so the weighted
    variant costs the same shuffle bytes + one multiply.
    """
    if not graph.weighted:
        raise ValueError("weighted_pagerank needs an EdgeTable built with weight=")
    spark = graph.edges.sparkSession
    edges = graph.edges
    n = graph.num_vertices()
    if n == 0:
        empty = spark.createDataFrame(
            [], schema="v long, wout double, rank double, prev double"
        )
        return IterationResult(state=empty, iterations=0, converged=True)
    reset = (1.0 - delta) / n if normalized else (1.0 - delta)
    init = 1.0 / n if normalized else 1.0

    wout = edges.groupBy(F.col("src").alias("v")).agg(
        F.sum("weight").alias("wout")
    )
    state = (
        graph.vertices.join(wout, "v", "left")
        .select(
            "v",
            F.coalesce("wout", F.lit(0.0)).alias("wout"),
            F.lit(float(init)).alias("rank"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        pushers = cur.where(F.col("wout") > 0)
        sums = (
            pushers.join(edges, pushers["v"] == edges["src"])
            .select(
                edges["dst"].alias("dst"),
                (F.col("rank") * F.col("weight") / F.col("wout")).alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("msg"))
        )
        new = (
            cur.select("v", "wout", F.col("rank").alias("prev"))
            .join(sums, F.col("v") == F.col("dst"), "left")
            .drop("dst")
            .select(
                "v",
                "wout",
                (F.lit(reset) + F.lit(delta) * F.coalesce("msg", F.lit(0.0))).alias(
                    "rank"
                ),
                "prev",
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            active = materialized.where(
                F.abs(F.col("rank") - F.col("prev")) > threshold * F.col("prev")
            ).count()
            return {"active": active, "edges_traversed": graph.num_edges()}

        return new, metrics

    return iterate(
        state, step, stop=lambda m: m["active"] == 0, max_iter=max_iter
    )


def ranked(result_state: DataFrame, scaled_n: int | None = None) -> DataFrame:
    """(v, rank) sorted rank desc, v asc — the reference's stable-sorted
    extract (pr_enactor.cuh:1380-1401). ``scaled_n``: divide by n when
    the run used scaled (unnormalized) mode, matching test_pr.cu:461."""
    rank_col = F.col("rank") / scaled_n if scaled_n else F.col("rank")
    return result_state.select("v", rank_col.alias("rank")).orderBy(
        F.desc("rank"), F.asc("v")
    )
