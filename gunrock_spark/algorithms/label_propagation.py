"""Label propagation — min-label and mode-label (community) variants.

The north rule lists label propagation alongside CC; the reference
expresses the min-label form as its CC hooking pattern (min wins,
gunrock/app/cc/cc_functor.cuh:179-193). Two synchronous variants:

- mode="min": label(v) <- min(label(v), min over neighbors) to
  fixpoint. With identity initialization this equals connected
  components; arbitrary initial labels (e.g. seed communities)
  propagate the smallest seed per component.
- mode="mode": classic community LP — label(v) <- most frequent label
  among neighbors, ties broken by the SMALLEST label (deterministic,
  synchronous update for every vertex simultaneously). Runs a fixed
  number of rounds (synchronous LP can oscillate, so ``max_iter``
  bounds it; convergence stop still applies when stable).

Plan per iteration: labels ⋈ symmetrized edges -> neighbor labels ->
  min:  groupBy(v).min(label)
  mode: groupBy(v, label).count() -> max_by((count, -label)) one-pass
        aggregate (no window, single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult, iterate
from gunrock_spark.graph.edge_table import EdgeTable


def label_propagation(
    graph: EdgeTable,
    initial_labels: DataFrame | None = None,
    mode: str = "min",
    max_iter: int = 20,
    directed: bool = False,
) -> IterationResult:
    """State: (v long, label long, prev long)."""
    spark = graph.edges.sparkSession
    edges = graph.edges if directed else graph.symmetrized().edges

    if initial_labels is None:
        state = graph.vertices.select("v", F.col("v").alias("label"))
    else:
        state = graph.vertices.join(initial_labels, "v", "left").select(
            "v", F.coalesce(F.col("label"), F.col("v")).cast("long").alias("label")
        )
    state = state.repartition(spark.sparkContext.defaultParallelism, "v").localCheckpoint(
        eager=True
    )

    def step(cur: DataFrame, i: int):
        cur = cur.select("v", "label")
        nbr = cur.join(edges, cur["v"] == edges["src"]).select(
            edges["dst"].alias("v"), F.col("label").alias("nbr_label")
        )
        if mode == "min":
            agg = nbr.groupBy("v").agg(F.min("nbr_label").alias("new_label"))
            new = cur.withColumnRenamed("label", "prev").join(agg, "v", "left").select(
                "v",
                F.least(F.col("prev"), F.coalesce("new_label", F.col("prev"))).alias("label"),
                "prev",
            )
        elif mode == "mode":
            # most frequent neighbor label; ties -> smallest label.
            # one shuffle: count per (v,label), then max_by on the
            # (count, -label) pair — no window function needed.
            counts = nbr.groupBy("v", "nbr_label").agg(F.count(F.lit(1)).alias("cnt"))
            agg = counts.groupBy("v").agg(
                F.max_by("nbr_label", F.struct(F.col("cnt"), F.negative("nbr_label"))).alias(
                    "new_label"
                )
            )
            new = cur.withColumnRenamed("label", "prev").join(agg, "v", "left").select(
                "v", F.coalesce("new_label", F.col("prev")).alias("label"), "prev"
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")

        def metrics(materialized: DataFrame) -> dict:
            changed = materialized.where(F.col("label") != F.col("prev")).count()
            return {"changed": changed, "edges_traversed": graph.num_edges()}

        return new, metrics

    return iterate(state, step, stop=lambda m: m["changed"] == 0, max_iter=max_iter)


def seeded_label_propagation(
    graph: EdgeTable,
    seeds: DataFrame,
    max_iter: int = 10,
    directed: bool = False,
) -> IterationResult:
    """Semi-supervised label spreading (Zhu-Ghahramani 2002 family,
    hard-clamped): ``seeds`` is DataFrame[v, label]; seed labels are
    CLAMPED, every other vertex synchronously takes the most frequent
    label among its LABELED neighbors (ties -> smallest label) each
    round, starting unlabeled. Stops when no label changes. Result
    state: (v, label) with label NULL for vertices no seed can reach.

    Same per-round plan as mode-LP (one count shuffle + one max_by
    aggregate — no window); the unlabeled frontier shrinks as labels
    spread, and the join against the (100 TB) edge table only carries
    currently-labeled rows."""
    spark = graph.edges.sparkSession
    edges = graph.edges if directed else graph.symmetrized().edges
    seed_rows = seeds.select(
        F.col("v").cast("long").alias("v"), F.col("label").cast("long").alias("slabel")
    )
    state = (
        graph.vertices.join(seed_rows, "v", "left")
        .select(
            "v",
            F.col("slabel").alias("label"),
            F.col("slabel").isNotNull().alias("seed"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )

    def step(cur: DataFrame, i: int):
        labeled = cur.where(F.col("label").isNotNull()).select("v", "label")
        nbr = labeled.join(edges, labeled["v"] == edges["src"]).select(
            edges["dst"].alias("v"), F.col("label").alias("nbr_label")
        )
        counts = nbr.groupBy("v", "nbr_label").agg(F.count(F.lit(1)).alias("cnt"))
        agg = counts.groupBy("v").agg(
            F.max_by(
                "nbr_label", F.struct(F.col("cnt"), F.negative("nbr_label"))
            ).alias("new_label")
        )
        new = (
            cur.select("v", F.col("label").alias("prev"), "seed")
            .join(agg, "v", "left")
            .select(
                "v",
                F.when(F.col("seed"), F.col("prev"))
                .otherwise(F.coalesce("new_label", F.col("prev")))
                .alias("label"),
                "prev",
                "seed",
            )
        )

        def metrics(materialized: DataFrame) -> dict:
            changed = materialized.where(
                ~(F.col("label").eqNullSafe(F.col("prev")))
            ).count()
            return {"changed": changed, "edges_traversed": graph.num_edges()}

        return new, metrics

    result = iterate(state, step, stop=lambda m: m["changed"] == 0, max_iter=max_iter)
    result.state = result.state.select("v", "label")
    return result
