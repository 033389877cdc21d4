"""Deterministic random-walk sampling — the DeepWalk/node2vec input
generator, expressed as iterated frontier advance.

The reference ships `sample` only as a new-primitive skeleton (its
problem struct is a verbatim SSSP copy,
gunrock/app/sample/sample_problem.cuh:27-37, test driver
tests/sample/test_sample.cu:10 still says "test_sssp.cu"), so there
are no sampling semantics to transcribe; this operator supplies the
sampling primitives a link-graph training pipeline actually needs:
fixed-length walks from every (or a chosen set of) start vertices —
first-order uniform (:func:`random_walks`) and second-order
node2vec-biased (:func:`node2vec_walks`) — one step = one advance
over the out-adjacency, exactly the reference's frontier-advance
iteration shape (SURVEY.md §2.1).

Determinism contract (what makes the walks oracle-able in ANSI SQL
and reproducible across engines/cluster sizes):

  neighbor order  = out-edges ranked by dst asc (rnk = 0..deg-1),
                    the CSR column order of a sorted build
  walk identity   wid = start * walks_per_vertex + walk  (globally
                    unique per walk, so two walks that meet at the
                    same vertex at the same step draw DIFFERENT next
                    hops and decorrelate — mixing only (cur, step,
                    walk) would coalesce their suffixes forever)
  choice at (cur, step, wid) =
      h   = ((cur % P) * 1000003 + step * 7919
             + (wid % P) * 104729 + seed) % P
      uniform:   rnk = h % out_degree(cur)
      node2vec:  r   = h % total_weight; pick the candidate whose
                 cumulative weight interval (in rnk order) covers r

  with P = 900_000_007. Pure 64-bit-safe integer arithmetic
  ((cur % P) * 1000003 < 9e14, (wid % P) * 104729 < 9.5e13), no
  engine-specific hash, so DuckDB computes the identical walk. A walk
  that reaches a sink (out_degree 0) simply ends — later steps emit
  no row for it.

Scale notes (100 TB link graph): the ranked layout is one
row_number window partitioned by src — the same one-off cost/layout
as the CSR build, reused across all walks. First-order steps shuffle
only the |starts|x|walks| frontier through two equi-joins (degree
fetch, then (src, rnk) edge lookup — never a per-neighbor expansion,
so hub fan-out never materializes). Second-order (node2vec) steps
MUST see every candidate's class (return / distance-1 / distance-2
from the previous vertex), so each step expands the frontier by
deg(cur) candidate rows and probes edge existence with one more
equi-join — the irreducible node2vec cost; the per-walk cumulative
window is bounded by deg(cur), the same cost class as the adjacency
ranking itself. Intermediates are persisted during the unroll and
unpersisted once the final union is materialized (localCheckpoint),
so repeated calls don't accumulate executor storage.
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


def _step_hash(cur, step: int, wid, seed: int):
    h = (
        F.pmod(cur, F.lit(HASH_P)) * HASH_A
        + F.lit(step * HASH_STEP)
        + F.pmod(wid, F.lit(HASH_P)) * HASH_WALK
        + F.lit(seed)
    )
    return F.pmod(h, F.lit(HASH_P))


def _wid(walks_per_vertex: int):
    return F.col("start") * walks_per_vertex + F.col("walk")


def _start_state(graph: EdgeTable, starts: DataFrame | None, walks_per_vertex: int) -> DataFrame:
    if starts is None:
        starts = graph.vertices
    return starts.select(
        F.col("v").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
        F.col("v").alias("cur"),
    )


def _finish(levels: list[DataFrame], persisted: list[DataFrame]) -> DataFrame:
    """Union the per-step outputs, materialize, release intermediates."""
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.localCheckpoint(eager=True)
    for df in persisted:
        try:
            df.unpersist()
        except Exception:
            pass
    return out


def random_walks(
    graph: EdgeTable,
    walk_length: int = 4,
    *,
    walks_per_vertex: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[start, walk, step, v]: deterministic uniform walks of
    ``walk_length`` steps from every start vertex (default: all
    vertices), ``walks_per_vertex`` walks each (walk = 0..n-1).
    step 0 is the start vertex itself.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")

    # Persisted while unrolling: the ranked layout is joined at every
    # step, and each step's state feeds BOTH the next step and its own
    # output branch of the final union — without the persist each
    # union branch would recompute its whole walk prefix (O(K^2)
    # joins) and re-run the ranking window per step. All released by
    # _finish once the result is materialized.
    ranked = ranked_adjacency(graph).persist(StorageLevel.MEMORY_AND_DISK)
    persisted: list[DataFrame] = [ranked]
    outdeg = graph.degrees.select("v", "out_degree").where(F.col("out_degree") > 0)

    state = _start_state(graph, starts, walks_per_vertex)
    levels = [
        state.select("start", "walk", F.lit(0).cast("int").alias("step"), F.col("cur").alias("v"))
    ]
    for t in range(1, walk_length + 1):
        chosen = (
            state.join(outdeg, state["cur"] == outdeg["v"])
            .withColumn(
                "target",
                F.pmod(
                    _step_hash(F.col("cur"), t, _wid(walks_per_vertex), seed),
                    F.col("out_degree"),
                ),
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
        persisted.append(state)
        levels.append(
            state.select(
                "start", "walk", F.lit(t).cast("int").alias("step"), F.col("cur").alias("v")
            )
        )
    return _finish(levels, persisted)


def weighted_ranked_adjacency(graph: EdgeTable) -> DataFrame:
    """DataFrame[src, dst, w, cum, tot] — out-edges ranked by dst asc
    with exact per-src cumulative integer weights: cum is the running
    sum in dst order, tot the per-src total. Weights are cast to
    BIGINT (the engine's weighted views carry small integral weights;
    pre-quantize anything else) so the inverse-CDF draw is exact
    64-bit arithmetic. Built ONCE per graph — two windows over the
    edge table, the weighted twin of :func:`ranked_adjacency`."""
    if not graph.weighted:
        raise ValueError("weighted_ranked_adjacency needs a weighted EdgeTable")
    w_cum = (
        Window.partitionBy("src")
        .orderBy("dst")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("src")
    base = graph.edges.select(
        "src", "dst", F.col("weight").cast("long").alias("w")
    ).where(F.col("w") > 0)  # zero-weight edges are never traversable
    return base.select(
        "src",
        "dst",
        "w",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("tot"),
    )


def weighted_walks(
    graph: EdgeTable,
    walk_length: int = 4,
    *,
    walks_per_vertex: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[start, walk, step, v]: first-order walks with
    next-hop probability proportional to the INTEGER edge weight —
    the weighted-DeepWalk / weighted-graph embedding sampler. Draw at
    (cur, step, wid): r = hash % tot(cur); the chosen edge is the one
    whose cumulative-weight interval [cum - w, cum) covers r (inverse
    CDF in dst order) — all-integer, so SQL oracles replay every
    trajectory bit-for-bit; unit weights degenerate to
    :func:`random_walks` (r = h % d picks rank r).

    Scale shape: the cumulative layout is built once (two windows,
    same cost class as ranked_adjacency); each step expands the
    frontier by deg(cur) candidate rows through ONE equi-join on src
    and keeps the single covering row — the same irreducible
    expansion as the node2vec step, without the edge-probe join."""
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    wadj = weighted_ranked_adjacency(graph).persist(StorageLevel.MEMORY_AND_DISK)
    persisted: list[DataFrame] = [wadj]

    state = _start_state(graph, starts, walks_per_vertex)
    levels = [
        state.select(
            "start", "walk", F.lit(0).cast("int").alias("step"), F.col("cur").alias("v")
        )
    ]
    for t in range(1, walk_length + 1):
        joined = state.join(wadj, state["cur"] == wadj["src"])
        r = F.pmod(
            _step_hash(F.col("cur"), t, _wid(walks_per_vertex), seed),
            F.col("tot"),
        )
        state = (
            joined.where((F.col("cum") > r) & (F.col("cum") - F.col("w") <= r))
            .select("start", "walk", F.col("dst").alias("cur"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        persisted.append(state)
        levels.append(
            state.select(
                "start", "walk", F.lit(t).cast("int").alias("step"), F.col("cur").alias("v")
            )
        )
    return _finish(levels, persisted)


def node2vec_walks(
    graph: EdgeTable,
    walk_length: int = 4,
    *,
    p: int = 1,
    q: int = 1,
    walks_per_vertex: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[start, walk, step, v]: second-order node2vec-biased
    walks (Grover & Leskovec 2016). From previous vertex s at current
    vertex v, candidate x (an out-neighbor of v) is weighted

        1/p  if x == s                  (return)
        1    if edge s -> x exists      (distance-1, "stay close")
        1/q  otherwise                  (distance-2, "explore")

    ``p`` and ``q`` must be POSITIVE INTEGERS here: weights are scaled
    by p*q to the integer triple (q, p*q, p), so the inverse-CDF draw
    r = hash % total_weight is exact 64-bit arithmetic that an ANSI
    SQL oracle replays bit-for-bit (no float weight normalization).
    Step 1 has no previous vertex and is a uniform first-order step.
    p=q=1 degenerates to :func:`random_walks` (same trajectories: the
    uniform pick rnk = h % d is exactly the unit-weight inverse CDF).
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if p < 1 or q < 1:
        raise ValueError("p and q must be positive integers (weights scale by p*q)")
    w_ret, w_d1, w_d2 = q, p * q, p

    ranked = ranked_adjacency(graph).persist(StorageLevel.MEMORY_AND_DISK)
    persisted: list[DataFrame] = [ranked]
    outdeg = graph.degrees.select("v", "out_degree").where(F.col("out_degree") > 0)
    # edge-existence probe table for the distance-1 class
    probe = graph.edges.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    )

    base = _start_state(graph, starts, walks_per_vertex)
    levels = [
        base.select("start", "walk", F.lit(0).cast("int").alias("step"), F.col("cur").alias("v"))
    ]
    # state after step 1: (start, walk, prev, cur) — uniform first hop
    first = (
        base.join(outdeg, base["cur"] == outdeg["v"])
        .withColumn(
            "target",
            F.pmod(
                _step_hash(F.col("cur"), 1, _wid(walks_per_vertex), seed),
                F.col("out_degree"),
            ),
        )
        .select("start", "walk", "cur", "target")
    )
    state = (
        first.join(
            ranked, (first["cur"] == ranked["src"]) & (first["target"] == ranked["rnk"])
        )
        .select("start", "walk", F.col("cur").alias("prev"), F.col("dst").alias("cur"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    persisted.append(state)
    if walk_length >= 1:
        levels.append(
            state.select(
                "start", "walk", F.lit(1).cast("int").alias("step"), F.col("cur").alias("v")
            )
        )

    cum_w = (
        Window.partitionBy("start", "walk")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("start", "walk")
    for t in range(2, walk_length + 1):
        expanded = state.join(ranked, state["cur"] == ranked["src"]).select(
            "start",
            "walk",
            "prev",
            F.col("cur").alias("from_v"),
            F.col("dst").alias("x"),
            "rnk",
        )
        cand = expanded.join(
            probe,
            (expanded["prev"] == probe["e_src"]) & (expanded["x"] == probe["e_dst"]),
            "left",
        ).select(
            "start",
            "walk",
            "from_v",
            "x",
            "rnk",
            F.when(F.col("x") == F.col("prev"), F.lit(w_ret))
            .when(F.col("e_src").isNotNull(), F.lit(w_d1))
            .otherwise(F.lit(w_d2))
            .cast("long")
            .alias("w"),
        )
        sel = cand.select(
            "start",
            "walk",
            "from_v",
            "x",
            "w",
            F.sum("w").over(cum_w).alias("cum"),
            F.sum("w").over(tot_w).alias("tot"),
        ).withColumn(
            "r",
            F.pmod(
                _step_hash(F.col("from_v"), t, _wid(walks_per_vertex), seed),
                F.col("tot"),
            ),
        )
        state = (
            sel.where((F.col("cum") > F.col("r")) & (F.col("cum") - F.col("w") <= F.col("r")))
            .select("start", "walk", F.col("from_v").alias("prev"), F.col("x").alias("cur"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        persisted.append(state)
        levels.append(
            state.select(
                "start", "walk", F.lit(t).cast("int").alias("step"), F.col("cur").alias("v")
            )
        )
    return _finish(levels, persisted)


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """DataFrame[center, context, n]: skip-gram (center, context)
    co-occurrence counts within ``window`` steps along each walk — the
    pair-generation stage between random_walks/node2vec_walks and a
    word2vec-style embedding trainer (DeepWalk §4.2).

    Scale shape: each walk's rows are gathered into ONE array
    (groupBy(start, walk) — walk length is bounded, so rows are tiny),
    pairs are generated IN-ARRAY with higher-order functions (no
    walk-id self-join, which would re-shuffle the |walks|x(len+1) table
    a second time), and one map-side-combined groupBy counts them."""
    if window < 1:
        raise ValueError("window must be >= 1")
    arr = walks.groupBy("start", "walk").agg(
        F.array_sort(F.collect_list(F.struct("step", "v"))).alias("w")
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                f"""flatten(transform(w, a ->
                  transform(
                    filter(w, x -> x.step <> a.step
                                AND abs(x.step - a.step) <= {int(window)}),
                    b -> struct(a.v AS center, b.v AS context))))"""
            )
        ).alias("p")
    ).select("p.center", "p.context")
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _khop_hop(
    frontier: DataFrame,
    ranked: DataFrame,
    outdeg: DataFrame,
    fanout: int,
    t: int,
    seed: int,
) -> DataFrame:
    """One sampling hop: fanout explode -> hash target rank ->
    (src, rnk) equi-join -> distinct. The plan shape gated by
    tests/test_plans.py — no window, no Python, no cartesian."""
    draws = (
        frontier.join(outdeg, "v")
        .select(
            F.col("v").alias("cur"),
            "out_degree",
            F.explode(F.sequence(F.lit(0), F.lit(int(fanout) - 1))).alias("j"),
        )
        .withColumn(
            "target",
            F.pmod(
                F.pmod(
                    F.pmod(F.col("cur"), F.lit(HASH_P)) * HASH_A
                    + F.lit(t * HASH_STEP)
                    + F.col("j") * HASH_WALK
                    + F.lit(int(seed)),
                    F.lit(HASH_P),
                ),
                F.col("out_degree"),
            ),
        )
        .select("cur", "target")
    )
    return (
        draws.join(
            ranked,
            (draws["cur"] == ranked["src"]) & (draws["target"] == ranked["rnk"]),
        )
        .select("src", "dst")
        .distinct()
    )


def khop_neighbor_sample(
    graph: EdgeTable,
    fanouts: list[int],
    *,
    seeds: DataFrame | None = None,
    seed: int = 42,
    direction: str = "out",
) -> DataFrame:
    """DataFrame[hop, src, dst]: deterministic bounded-fanout k-hop
    neighbor sampling — the mini-batch block builder for GraphSAGE /
    layer-sampled GNN training over the link graph (Hamilton et al.
    2017 §3.1; layer-wise frontier sharing as in FastGCN/LADIES;
    public knowledge). ``fanouts[t-1]`` is hop t's fanout.

    ``direction="in"`` samples IN-neighbors (who links to the frontier
    — the backlink blocks web-graph GNNs usually want): the identical
    contract over the reversed edge table's cached CSC layout, with
    output (src, dst) = (frontier vertex, sampled in-neighbor).

    Contract (what makes the blocks oracle-able in ANSI SQL):

      frontier_0 = distinct seed vertices (default: every vertex)
      hop t:     for each frontier vertex v with out-degree d > 0 and
                 each draw j = 0..fanout-1,
                   rnk_j = H(v, t, j, seed) % d
                   H     = ((v % P)*A + t*HASH_STEP + j*HASH_WALK
                            + seed) % P
                 sampled edges = DISTINCT (v, neighbor at rank rnk_j)
                 frontier_t    = distinct sampled dst
      output:    union over hops of (hop, src, dst)

    Draws are WITH replacement then deduplicated (standard GNN-loader
    behavior), so a vertex contributes <= min(fanout, d) distinct
    neighbors. Draws are shared per (vertex, hop) across every seed
    that reaches the vertex — layer-wise sampling — which is what
    lets the frontier be a distinct vertex SET instead of a per-seed
    multiset.

    Scale shape (100 TB link graph): the ranked layout is the same
    one-off per-src window as every walk op; each hop is one fanout-
    explode (f rows per frontier vertex — hub adjacency is never
    materialized), one (src, rnk) equi-join, and one distinct. The
    frontier grows <= xf per hop but is distinct-bounded by |V|, and
    a 10^7-degree hub costs exactly f lookups, not 10^7 rows.
    """
    if not fanouts:
        raise ValueError("fanouts must be a non-empty list")
    if any(f < 1 for f in fanouts):
        raise ValueError("every fanout must be >= 1")
    if direction not in ("out", "in"):
        raise ValueError("direction must be 'out' or 'in'")
    if direction == "in":
        graph = graph.reversed_layout()

    ranked = ranked_adjacency(graph).persist(StorageLevel.MEMORY_AND_DISK)
    persisted: list[DataFrame] = [ranked]
    outdeg = graph.degrees.select("v", "out_degree").where(F.col("out_degree") > 0)

    if seeds is None:
        seeds = graph.vertices
    frontier = seeds.select(F.col("v").cast("long").alias("v")).distinct()

    levels: list[DataFrame] = []
    for t, fanout in enumerate(fanouts, start=1):
        hop_edges = _khop_hop(frontier, ranked, outdeg, fanout, t, seed).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        persisted.append(hop_edges)
        levels.append(
            hop_edges.select(F.lit(t).cast("int").alias("hop"), "src", "dst")
        )
        frontier = hop_edges.select(F.col("dst").alias("v")).distinct()
    return _finish(levels, persisted)


NEG_CTX = 104_729  # context multiplier (reuses HASH_WALK's prime)
NEG_J = 7_919      # per-negative multiplier (reuses HASH_STEP's prime)


def negative_samples(
    pairs: DataFrame,
    weights: DataFrame,
    m: int = 3,
    seed: int = 42,
    buckets_per_item: int = 2,
) -> DataFrame:
    """DataFrame[center, context, j, neg] — ``m`` deterministic
    negative samples per (center, context) positive pair, drawn from
    the weighted unigram table ``weights`` (columns v, w with INTEGER
    w, e.g. degree or count^0.75 pre-rounded): the word2vec/LINE
    negative-sampling stage after skipgram_pairs (Mikolov et al. 2013
    §2.2; public knowledge).

    Draw j for pair (c, x) is the shared affine hash reduced into the
    exact integer CDF of ``weights``::

        r   = ((c % P) * A + (x % P) * NEG_CTX + j * NEG_J + seed) % P % W
        neg = the unique v with  cdf_lo(v) <= r < cdf_hi(v)

    All-integer end to end, so the draws are bit-replayable in ANSI
    SQL and stable across engines, retries and cluster sizes (the
    rand()-vs-hash argument of pipeline/sampling.py). A draw may
    collide with the positive context or the center; following
    word2vec's table sampler it is KEPT, so the output is exactly
    ``|pairs| * m`` rows. W must be << P (9e8) for negligible modulo
    bias — pass pre-scaled weights if the raw sum is larger.

    Scale shape: the CDF lookup is NOT a range join — the CDF is
    quantized into ~buckets_per_item*|vocab| fixed-width buckets,
    exploded into a (bucket, v, lo, hi) table (size |vocab| + #buckets
    rows) that is BROADCAST, and each draw equi-joins on its bucket
    then range-filters the ~buckets_per_item candidates. The weights
    table must therefore be driver-bounded (a truncated top-V unigram
    table — the standard word2vec practice), while ``pairs`` streams
    at any size with no shuffle beyond the explode.
    """
    if m < 1:
        raise ValueError("m must be >= 1")
    w = weights.select(
        F.col("v").cast("long").alias("v"), F.col("w").cast("long").alias("w")
    ).where(F.col("w") > 0)
    cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = w.select(
        "v", "w", F.sum("w").over(cum).alias("hi")
    ).select("v", (F.col("hi") - F.col("w")).alias("lo"), "hi")
    cdf = cdf.localCheckpoint(eager=True)  # bounded vocab; cut the window plan
    agg = cdf.agg(
        F.max("hi").alias("W"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total, n_vocab = int(agg["W"]), int(agg["n"])
    width = max(1, total // max(1, buckets_per_item * n_vocab))
    buckets = cdf.select(
        F.explode(
            F.sequence(
                (F.col("lo") / width).cast("long"),
                ((F.col("hi") - 1) / width).cast("long"),
            )
        ).alias("b"),
        "v",
        "lo",
        "hi",
    )
    draws = pairs.select(
        F.col("center").cast("long").alias("center"),
        F.col("context").cast("long").alias("context"),
        F.explode(F.sequence(F.lit(1), F.lit(int(m)))).alias("j"),
    ).withColumn(
        "r",
        F.pmod(
            F.pmod(
                F.pmod(F.col("center"), F.lit(HASH_P)) * HASH_A
                + F.pmod(F.col("context"), F.lit(HASH_P)) * NEG_CTX
                + F.col("j") * NEG_J
                + F.lit(int(seed)),
                F.lit(HASH_P),
            ),
            F.lit(total),
        ),
    )
    return (
        draws.join(
            F.broadcast(buckets),
            (draws["r"] / width).cast("long") == buckets["b"],
        )
        .where((F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")))
        .select("center", "context", "j", F.col("v").alias("neg"))
    )
