"""Katz and eigenvector centrality — the two classic spectral
link-importance scores that complete the PageRank/HITS/SALSA family.

The reference ships the PageRank family only (gunrock/app/pr/,
gunrock/app/hits/, gunrock/app/salsa/); Katz (Katz 1953) and
eigenvector centrality (Bonacich 1972) are the remaining members of
the same "repeat: gather in-neighbor mass, update" loop and reuse the
identical Spark plan shape as the PR iteration
(gunrock_spark/algorithms/pagerank.py): ONE co-partitioned
state ⋈ edges join + ONE map-side-combined sum per iteration, lineage
cut per iteration, hub tier auto-wired for power-law skew.

Update rules (synchronous, deterministic, SQL-replayable):

  Katz          x_{t+1}(v) = beta + alpha * sum_{u->v} x_t(u),
                x_0(v) = beta
  Eigenvector   y(v)      = sum_{u->v} x_t(u)
                x_{t+1}   = y / sum(y)        (L1 power iteration)
                x_0(v)    = 1 / |V|

Both run a FIXED number of iterations by default (the driver-oracle
contract: DuckDB unrolls the same recurrence bit-for-bit up to a
ROUND(.,6) quantization); ``tol`` adds an early-stop on max |delta|.

Scale notes (100 TB link graph):
- state is |V| rows, never broadcast; the per-iteration shuffle is the
  same partial-agg sum PageRank pays — no extra exchanges.
- L1 normalization needs one global scalar per iteration; it rides the
  SAME action that materializes the lineage cut (the metrics callable),
  so the iteration stays one-job.
- hub skew: the same detect_hot_vertices gate as PR routes mega-hub
  out-edges through the broadcast tier (engine/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def _gather(state: DataFrame, graph: EdgeTable, hot, value_col: str) -> DataFrame:
    """sum of state[value_col] over in-edges: DataFrame[dst, msg]."""
    hot_ids, hot_edges, cold_edges = hot
    pushers = state.select("v", value_col)
    if hot_ids:
        from gunrock_spark.engine.skew import skewed_state_edge_join

        joined = skewed_state_edge_join(
            pushers, hot_edges, cold_edges, hot_ids, "v", "src"
        ).select("dst", F.col(value_col).alias("contrib"))
    else:
        edges = graph.edges
        joined = pushers.join(edges, pushers["v"] == edges["src"]).select(
            edges["dst"].alias("dst"), F.col(value_col).alias("contrib")
        )
    return joined.groupBy("dst").agg(F.sum("contrib").alias("msg"))


def _hot_split(graph: EdgeTable, skew) -> tuple[list[int], DataFrame | None, DataFrame | None]:
    spark = graph.edges.sparkSession
    hot_ids: list[int] = []
    hot_edges = cold_edges = None
    if skew:
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
            hot_edges, cold_edges = split_hot_edges(graph.edges, hot_ids, "src")
    return hot_ids, hot_edges, cold_edges


def katz_centrality(
    graph: EdgeTable,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iter: int = 8,
    tol: float = 0.0,
    skew: str | list[int] = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> IterationResult:
    """Katz centrality: IterationResult with state DataFrame[v, score].

    ``alpha`` must be < 1/lambda_max for the infinite series to
    converge; with fixed ``max_iter`` any alpha yields the truncated
    series (the oracle contract). ``tol=0`` disables early stop so the
    iteration count — and therefore the SQL replay — is exact.

    ``checkpoint_dir``/``resume`` give the same kill/resume contract
    as pagerank (engine/checkpoint.py): per-partition state snapshots
    + metrics every ``checkpoint_interval`` iterations; a resumed run
    continues mid-series and reaches the identical truncated sum.
    """
    spark = graph.edges.sparkSession
    state = (
        graph.vertices.select("v", F.lit(float(beta)).alias("score"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )
    checkpointer = None
    start_iter, prior_metrics = 0, None
    if checkpoint_dir is not None:
        from gunrock_spark.engine.checkpoint import CheckpointManager

        checkpointer = CheckpointManager(
            checkpoint_dir,
            config={
                "algorithm": "katz",
                "alpha": alpha,
                "beta": beta,
                "tol": tol,
                "m": graph.num_edges(),
            },
        )
        if resume:
            loaded = checkpointer.load_latest(spark)
            if loaded is not None:
                state, start_iter, prior_metrics = loaded
    hot = _hot_split(graph, skew)

    def step(cur: DataFrame, i: int):
        sums = _gather(cur, graph, hot, "score")
        new = (
            cur.select("v", F.col("score").alias("prev"))
            .join(sums, F.col("v") == F.col("dst"), "left")
            .select(
                "v",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("msg", F.lit(0.0))
                ).alias("score"),
                "prev",
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            row = materialized.agg(
                F.max(F.abs(F.col("score") - F.col("prev"))).alias("d")
            ).collect()[0]
            return {
                "max_delta": float(row["d"] or 0.0),
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    result = iterate(
        state,
        step,
        stop=(lambda m: m["max_delta"] <= tol) if tol > 0 else (lambda m: False),
        max_iter=max_iter,
        checkpointer=checkpointer,
        checkpoint_interval=checkpoint_interval,
        start_iteration=start_iter,
        prior_metrics=prior_metrics,
    )
    result.state = result.state.select("v", "score")
    for split in hot[1:]:
        if split is not None:
            try:
                split.unpersist()
            except Exception:
                pass
    return result


def eigenvector_centrality(
    graph: EdgeTable,
    max_iter: int = 10,
    tol: float = 0.0,
    skew: str | list[int] = "auto",
) -> IterationResult:
    """L1-normalized power iteration on A^T: IterationResult with
    state DataFrame[v, score], sum(score) == 1 every iteration.

    Directed semantics: score flows along edges src -> dst (a vertex
    is central when pointed to by central vertices) — the in-edge
    analog of the reference's HITS authority half without the hub
    coupling. On graphs whose largest eigenvalue is not unique the
    fixed-iteration truncation is still deterministic (and is what the
    SQL oracle replays).
    """
    spark = graph.edges.sparkSession
    state = (
        graph.vertices.select("v", F.lit(1.0).alias("score"))
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )
    n0 = state.count()
    state = state.select("v", (F.col("score") / F.lit(float(n0))).alias("score"))
    hot = _hot_split(graph, skew)

    def step(cur: DataFrame, i: int):
        sums = _gather(cur, graph, hot, "score")
        raw = (
            cur.select("v", F.col("score").alias("prev"))
            .join(sums, F.col("v") == F.col("dst"), "left")
            .select("v", F.coalesce("msg", F.lit(0.0)).alias("raw"), "prev")
        )

        # Normalization scalar: one global sum. It must come from the
        # SAME materialized snapshot the next iteration reads, so we
        # checkpoint the raw state here (eager) and read the scalar —
        # one extra |V|-row pass per iteration, no second edge scan.
        raw = raw.localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("s")).collect()[0]["s"] or 0.0
        if total <= 0.0:
            # no edges at all: the zero vector is a fixpoint
            new = raw.select("v", F.lit(0.0).alias("score"), "prev")
        else:
            new = raw.select(
                "v", (F.col("raw") / F.lit(float(total))).alias("score"), "prev"
            )

        def metrics(materialized: DataFrame) -> dict:
            row = materialized.agg(
                F.max(F.abs(F.col("score") - F.col("prev"))).alias("d")
            ).collect()[0]
            return {
                "max_delta": float(row["d"] or 0.0),
                "edges_traversed": graph.num_edges(),
            }

        return new, metrics

    result = iterate(
        state,
        step,
        stop=(lambda m: m["max_delta"] <= tol) if tol > 0 else (lambda m: False),
        max_iter=max_iter,
    )
    result.state = result.state.select("v", "score")
    for split in hot[1:]:
        if split is not None:
            try:
                split.unpersist()
            except Exception:
                pass
    return result
