"""SimRank link-based similarity — Monte-Carlo coupled reverse walks.

SimRank (Jeh & Widom, KDD 2002) scores two pages as similar when they
are LINKED FROM similar pages:  s(a,b) = C/(|I(a)||I(b)|) *
sum over in-neighbor pairs of s(i,j), s(a,a) = 1.  The exact
fixed-point needs O(|V|^2) state — a non-starter on a web graph — so
this module implements the standard Monte-Carlo reformulation
(Fogaras & Racz, WWW 2005, "Scaling link-based similarity search"):

    s(a, b) = E[ C^tau(a,b) ]

where tau is the FIRST MEETING STEP of two independent reverse random
walks started at a and b (they must collide at the same vertex at the
same step; a walk that dies at a zero-in-degree vertex never meets).
The estimator here is the coupled one: ``walks_per_vertex`` reverse
walks per vertex, and walk index i of the query is paired with walk
index i of every other vertex, so the estimate is

    s_hat(q, v) = (1/R) * sum_i C^{tau_i(q, v)}        (R walks)

with C^tau contributing 0 when pair i never meets within
``walk_length`` steps.

The walks are :func:`gunrock_spark.algorithms.walks.random_walks`
over the REVERSED graph, so they inherit that module's determinism
contract (pure 64-bit affine hash over (cur, step, wid); wid embeds
the start vertex, so the query's walk i and another vertex's walk i
are decorrelated even when they occupy the same vertex).  With the
default decay C = 1/2 every score is a dyadic rational
(sum of 2^-tau over at most R terms, divided by R), which double
arithmetic represents EXACTLY — the DuckDB oracle in
``__spark_entry__`` replays the walks and reproduces the scores
bit-for-bit, no float-tolerance handwaving.

The reference has no SimRank app (its link-similarity surface is
cocitation/bibliographic coupling via the join kernels,
gunrock/oprtr/1D_oprtr/for_all.cuh-style composition — covered by
algorithms/linkpred.py); this operator extends the same
walk machinery to the similarity measure a web-scale "related pages"
/ near-duplicate-host pipeline actually queries.

Scale shape (100 TB link graph): the walk table is R*(T+1)*|V| rows
built by T frontier advances (two equi-joins per step, hub fan-out
never materialized — walks.py's shape).  The query side is
|Q|*R*T rows (|Q| bounded — related-page queries come in small
batches), so the meeting join is a BROADCAST hash join keyed on
(walk, step, vertex): the big walk table streams through it
scan-shaped, followed by two partial aggregations (first-meeting min,
then the score sum).  Nothing materializes |V|^2 pairs: the output is
at most |Q| * |V| rows and only pairs that actually met appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def simrank_scores(
    graph: EdgeTable,
    queries: DataFrame | None = None,
    *,
    n_queries: int = 3,
    walk_length: int = 3,
    walks_per_vertex: int = 4,
    seed: int = 7,
    salt: int = 0,
) -> DataFrame:
    """DataFrame[q, v, score]: Monte-Carlo SimRank of every vertex v
    against each query vertex q (decay C = 1/2, ``walks_per_vertex``
    coupled reverse walks of ``walk_length`` steps).

    ``queries`` is a DataFrame[q long] of query vertices; when None,
    the ``n_queries`` deterministic sample of
    :func:`gunrock_spark.algorithms.bc.sample_sources` (smallest
    h60(salt:v)) is used so results are reproducible across engines.
    Pairs that never meet are absent (score 0 by definition); q
    itself is excluded (s(q,q) = 1 identically).
    """
    from gunrock_spark.algorithms.bc import sample_sources
    from gunrock_spark.algorithms.walks import random_walks

    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if queries is None:
        queries = sample_sources(graph, n_queries, salt=salt).select(
            F.col("source").alias("q")
        )
    else:
        queries = queries.select(F.col("q").cast("long").alias("q"))

    # Reverse walks from every vertex; reversed_layout() reuses the
    # cached CSC-analog partitioning when the graph already built one.
    walks = random_walks(
        graph.reversed_layout(),
        walk_length=walk_length,
        walks_per_vertex=walks_per_vertex,
        seed=seed,
    ).where(F.col("step") >= 1)

    # Distinct column names on the (tiny) query side keep the
    # walk-table self-join unambiguous: the big `walks` side keeps
    # (start, walk, step, v), the broadcast side gets (q, qwalk,
    # qstep, meet_v).
    qwalks = walks.join(F.broadcast(queries), walks["start"] == queries["q"]).select(
        "q",
        F.col("walk").alias("qwalk"),
        F.col("step").alias("qstep"),
        F.col("v").alias("meet_v"),
    )
    meets = walks.join(
        F.broadcast(qwalks),
        (F.col("walk") == F.col("qwalk"))
        & (F.col("step") == F.col("qstep"))
        & (F.col("v") == F.col("meet_v"))
        & (F.col("start") != F.col("q")),
    ).select("q", F.col("start").alias("u"), "walk", "step")
    tau = meets.groupBy("q", "u", "walk").agg(F.min("step").alias("tau"))
    return tau.groupBy("q", "u").agg(
        (F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("tau"))) / walks_per_vertex).alias(
            "score"
        )
    ).select("q", F.col("u").alias("v"), "score")
