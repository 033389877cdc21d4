"""Deterministic random-walk sampling — the DeepWalk/node2vec input
generator, expressed as iterated frontier advance.

The reference ships `sample` only as a new-primitive skeleton (its
problem struct is a verbatim SSSP copy,
gunrock/app/sample/sample_problem.cuh:27-37, test driver
tests/sample/test_sample.cu:10 still says "test_sssp.cu"), so there
are no sampling semantics to transcribe; this operator supplies the
sampling primitive a link-graph training pipeline actually needs:
fixed-length walks from every (or a chosen set of) start vertices,
one step = one advance over the out-adjacency, exactly the
reference's frontier-advance iteration shape (SURVEY.md §2.1).

Determinism contract (what makes the walks oracle-able in ANSI SQL
and reproducible across engines/cluster sizes):

  neighbor order  = out-edges ranked by dst asc (rnk = 0..deg-1),
                    the CSR column order of a sorted build
  choice at (cur, step, walk) =
      h   = ((cur % P) * 1000003 + step * 7919 + walk * 104729 + seed) % P
      rnk = h % out_degree(cur)            with P = 900_000_007

Pure 64-bit-safe integer arithmetic ((cur % P) * 1000003 < 9e14), no
engine-specific hash, so DuckDB computes the identical walk. A walk
that reaches a sink (out_degree 0) simply ends — later steps emit no
row for it.

Scale notes (100 TB link graph): the ranked layout is one
row_number window partitioned by src — the same one-off cost/layout
as the CSR build, reused across all walks; a 10^6-out-degree hub
sorts inside one task, acceptable one-time. Each step shuffles only
the |starts|x|walks| frontier (state rows, not edges) through two
equi-joins (degree fetch, then (src, rnk) edge lookup — never a
per-neighbor expansion, so hub fan-out never materializes). Total
cost: walk_length shuffles of the frontier, each a fraction of one
PageRank iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from gunrock_spark.graph.edge_table import EdgeTable

HASH_P = 900_000_007
HASH_A = 1_000_003
HASH_STEP = 7_919
HASH_WALK = 104_729


def ranked_adjacency(graph: EdgeTable) -> DataFrame:
    """DataFrame[src, dst, rnk] — out-edges ranked by dst asc within
    each src (rnk = 0..out_degree-1), the sorted-CSR column order."""
    w = Window.partitionBy("src").orderBy("dst")
    return graph.edges.select("src", "dst").withColumn(
        "rnk", (F.row_number().over(w) - 1).cast("long")
    )


def _step_hash(cur, step: int, seed: int):
    h = (
        F.pmod(cur, F.lit(HASH_P)) * HASH_A
        + F.lit(step * HASH_STEP)
        + F.col("walk") * HASH_WALK
        + F.lit(seed)
    )
    return F.pmod(h, F.lit(HASH_P))


def random_walks(
    graph: EdgeTable,
    walk_length: int = 4,
    *,
    walks_per_vertex: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[start, walk, step, v]: deterministic walks of
    ``walk_length`` steps from every start vertex (default: all
    vertices), ``walks_per_vertex`` walks each (walk = 0..n-1).
    step 0 is the start vertex itself.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")

    # Persisted (lazily): the ranked layout is joined at every step,
    # and each step's state feeds BOTH the next step and its own
    # output branch of the final union — without the persist each
    # union branch would recompute its whole walk prefix (O(K^2)
    # joins) and re-run the ranking window per step.
    ranked = ranked_adjacency(graph).persist(StorageLevel.MEMORY_AND_DISK)
    outdeg = graph.degrees.select("v", "out_degree").where(F.col("out_degree") > 0)

    if starts is None:
        starts = graph.vertices
    state = starts.select(
        F.col("v").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
        F.col("v").alias("cur"),
    )

    levels = [
        state.select("start", "walk", F.lit(0).cast("int").alias("step"), F.col("cur").alias("v"))
    ]
    for t in range(1, walk_length + 1):
        chosen = (
            state.join(outdeg, state["cur"] == outdeg["v"])
            .withColumn(
                "target", F.pmod(_step_hash(F.col("cur"), t, seed), F.col("out_degree"))
            )
            .select("start", "walk", "cur", "target")
        )
        state = (
            chosen.join(
                ranked,
                (chosen["cur"] == ranked["src"]) & (chosen["target"] == ranked["rnk"]),
            )
            .select("start", "walk", F.col("dst").alias("cur"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        levels.append(
            state.select(
                "start", "walk", F.lit(t).cast("int").alias("step"), F.col("cur").alias("v")
            )
        )

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
