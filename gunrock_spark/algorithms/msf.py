"""Minimum spanning forest — Borůvka rounds over frontier machinery.

Borůvka (1926) is THE dataflow-parallel MSF algorithm: every round,
each component selects its minimum-weight outgoing edge (one
partial-agg min per component — the advance+fused-reduce shape,
SURVEY.md §2.1), the selected edges merge components (pointer
doubling, the same contraction as components.py / scc.py /
urls.resolve_redirects), and the component count at least HALVES —
O(log V) rounds total. The reference has no MST/MSF app (its app list
stops at the traversal/centrality set), but the ingredient kernels —
per-segment min-reduce and hook-and-jump contraction — are exactly
its CC machinery (gunrock/app/cc/cc_functor.cuh), composed here for
the weighted objective.

Determinism: edges are totally ordered by the key (w, a, b) with
(a, b) the canonical undirected pair (a < b; undirected weight = MIN
over the two directed weights when both orientations exist). All keys
are distinct, so the MSF is UNIQUE — any correct algorithm (the
DuckDB Borůvka replay, a Python Kruskal) must produce the identical
edge set, which is what the oracle and tests assert.

Mutual-min 2-cycles: under a consistent total edge order, the
component-level "points to the component across my chosen edge"
functional graph has cycles of length exactly 2 (the globally minimal
edge of any path is chosen from both sides). The smaller label of
each mutual pair is made the root, and pointer doubling then
converges in ceil(log2(chain length)) jumps.

Scale shape (100 TB link graph): per round, one |E'| double-join to
label endpoints (E' = edges still crossing components — shrinks every
round), one map-side-combined min per component, and a pointer-jump
loop over a <= #components-row table. No windows, no Python, no
per-vertex sorts; the |E| table is never reshuffled beyond the
label-join, and chosen-edge structs ride the aggregation (no
join-back to recover arg-min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def _canonical_weighted(graph: EdgeTable) -> DataFrame:
    """DataFrame[a, b, w]: canonical undirected weighted edges —
    a < b, w = min over the directed orientations present."""
    if "weight" not in graph.edges.columns:
        raise ValueError("minimum_spanning_forest requires a weighted graph")
    return (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def minimum_spanning_forest(
    graph: EdgeTable, max_rounds: int = 64
) -> DataFrame:
    """DataFrame[a, b, w]: the unique minimum spanning forest under
    the (w, a, b) total edge order (one tree per connected component;
    |result| = |V| - #components)."""
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    und = (
        _canonical_weighted(graph)
        .repartition(n_part, "a")
        .localCheckpoint(eager=True)
    )
    labels = graph.vertices.select(
        "v", F.col("v").alias("l")
    ).localCheckpoint(eager=True)
    forest: list[DataFrame] = []

    for _ in range(max_rounds):
        e = (
            und.join(labels.select(F.col("v").alias("a"), F.col("l").alias("la")), "a")
            .join(labels.select(F.col("v").alias("b"), F.col("l").alias("lb")), "b")
            .where(F.col("la") != F.col("lb"))
        )
        # per-component arg-min edge: lexicographic struct min —
        # (w, a, b) is unique, la/lb ride along for the contraction
        cand = e.select(
            F.col("la").alias("l"),
            F.struct("w", "a", "b", F.col("lb").alias("other")).alias("k"),
        ).unionByName(
            e.select(
                F.col("lb").alias("l"),
                F.struct("w", "a", "b", F.col("la").alias("other")).alias("k"),
            )
        )
        sel = (
            cand.groupBy("l")
            .agg(F.min("k").alias("k"))
            .select("l", "k.w", "k.a", "k.b", "k.other")
            .localCheckpoint(eager=True)
        )
        if sel.isEmpty():
            break
        forest.append(sel.select("w", "a", "b").distinct())

        # hook: l -> partner component; mutual-min pair -> smaller
        # label becomes the root (points to itself)
        partner = sel.select("l", F.col("other").alias("p"))
        mutual = partner.alias("x").join(
            partner.alias("y"),
            (F.col("x.p") == F.col("y.l")) & (F.col("y.p") == F.col("x.l")),
            "left_semi",
        )
        roots = mutual.where(F.col("l") < F.col("p")).select(
            "l", F.col("l").alias("p")
        )
        p = (
            partner.join(roots.select(F.col("l").alias("_rl")), partner["l"] == F.col("_rl"), "left_anti")
            .unionByName(roots)
            .localCheckpoint(eager=True)
        )
        # pointer doubling to the roots
        while True:
            p2 = (
                p.alias("x")
                .join(p.alias("y"), F.col("x.p") == F.col("y.l"))
                .select(F.col("x.l").alias("l"), F.col("y.p").alias("p"))
                .localCheckpoint(eager=True)
            )
            changed = (
                p2.alias("n")
                .join(p.alias("o"), F.col("n.l") == F.col("o.l"))
                .where(F.col("n.p") != F.col("o.p"))
                .count()
            )
            p = p2
            if changed == 0:
                break
        labels = (
            labels.join(p.select(F.col("l").alias("_l"), F.col("p").alias("_p")),
                        labels["l"] == F.col("_l"), "left")
            .select("v", F.coalesce("_p", "l").alias("l"))
            .localCheckpoint(eager=True)
        )

    if not forest:
        return und.select("a", "b", "w").limit(0)
    out = forest[0]
    for f in forest[1:]:
        out = out.unionByName(f)
    return out.select("a", "b", "w").distinct()
