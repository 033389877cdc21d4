"""Approximate neighborhood function + effective diameter (HyperANF).

The reference has no distance-distribution primitive (its BFS reports
single-source depths only, gunrock/app/bfs/), but the neighborhood
function N(t) = #{(u,v) : dist(u,v) <= t} is THE canonical whole-graph
distance analysis for web crawls (Palmer et al., "ANF", KDD 2002;
Boldi-Rosa-Vigna, "HyperANF", WWW 2011 — the algorithm behind the
"four degrees of separation" measurement). Exact N(t) needs all-pairs
BFS; HyperANF keeps ONE HyperLogLog counter per vertex for the ball
B(v,t) = vertices reachable from v within t hops and iterates

    c_0(v)    = HLL({v})
    c_{t+1}(v) = c_t(v) union-merge c_t(w)  for every edge v -> w

because B(v,t+1) = {v} ∪ ⋃_{v->w} B(w,t) and HLL union = register max.

Spark mapping: the counter table is a sparse DataFrame (v, j, rho) —
at most |V|·m rows, registers never hit are implicit rho=0 — and one
round is ONE equi-join of the state against the reversed cached edge
layout (contributions flow dst -> src) plus a partial-aggregated
groupBy(v, j).max(rho): exactly the hash-min CC shuffle shape with
m-fold state, no all-pairs anything. Registers are monotone
(max-merge), so convergence is detected from two scalars of the
materialized state — row count and sum(rho) — with no join against
the previous round.

Determinism contract: the per-vertex item hash is the engine-wide
h60 md5 prefix (functions/hashing.py) on "seed:v", the register math
is the exact-integer HLL of pipeline/sketches.py (rho capped at
HLL_RHO_CAP so the harmonic sum is a BIGINT), and the only float ops
in the estimate are one literal-chain multiply/divide (and ln(m/V)
on <= m-1 distinct inputs in the linear-counting branch) on identical
exact operands in every engine — so a DuckDB oracle unrolling t
rounds reproduces every ball estimate bit-for-bit.

Scale notes (100 TB link graph): state <= |V|·m rows with m a small
power of two (16 => +-26% relative error, 64 => +-13%); each round
shuffles |E| contribution rows through one join co-located with the
cached CSC layout and map-side-combines the max. That is the same
per-round cost class as one PageRank iteration, times nothing — the
whole distance distribution for the price of ~diameter PR iterations,
where exact ANF would be |V| BFS runs.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from gunrock_spark.engine.iterate import IterationResult
from gunrock_spark.functions.hashing import h60
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.pipeline.sketches import HLL_RHO_CAP, _check_m, hll_alpha


def vertex_registers(
    vertices: DataFrame, m: int = 16, seed: str = "anf"
) -> DataFrame:
    """(v, j, rho): the radius-0 counter table — every vertex's HLL
    holds exactly its own id (one register hit per vertex)."""
    b = _check_m(m)
    h = h60(F.concat(F.lit(f"{seed}:"), F.col("v").cast("string")))
    rem = F.shiftright(h, b)
    lowbit = rem.bitwiseAND(-rem)
    rho = (
        F.when(rem == 0, F.lit(HLL_RHO_CAP))
        .otherwise(F.least(F.bit_count(lowbit - 1) + 1, F.lit(HLL_RHO_CAP)))
        .cast("int")
    )
    return vertices.select(
        "v", h.bitwiseAND(F.lit(m - 1)).cast("int").alias("j"), rho.alias("rho")
    )


def ball_estimates(registers: DataFrame, m: int = 16) -> DataFrame:
    """(v, ball_est long): per-vertex HLL cardinality estimate from a
    sparse counter table, exact-integer inner state (the per-vertex
    form of sketches.hll_estimate — same harmonic sum, same
    linear-counting small-range correction, same literal order so SQL
    oracles replay it bit-for-bit)."""
    _check_m(m)
    two_cap = 1 << HLL_RHO_CAP
    agg = registers.groupBy("v").agg(
        F.count(F.lit(1)).alias("hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - rho)")
        ).alias("s_present"),
    )
    s_scaled = (
        F.col("s_present")
        + (F.lit(m) - F.col("hit")).cast("long") * F.lit(two_cap)
    )
    zeros = (F.lit(m) - F.col("hit")).cast("long")
    raw = F.lit(hll_alpha(m)) * m * m * F.lit(float(two_cap)) / s_scaled
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)),
    ).otherwise(F.round(raw))
    return agg.select("v", est.cast("long").alias("ball_est"))


def anf_registers(
    graph: EdgeTable,
    radius: int,
    m: int = 16,
    seed: str = "anf",
    *,
    early_stop: bool = True,
) -> IterationResult:
    """Counter table (v, j, rho) after ``radius`` merge rounds —
    c(v) sketches B(v, t) = vertices reachable from v within t hops
    along OUT-edges. ``early_stop`` ends the loop once the registers
    stabilize (the transitive closure is reached); rounds past that
    are idempotent. Metrics per round: register rows, sum(rho), and
    the round's pair-count estimate ``n_pairs_est`` = Σ_v |B(v,t)|."""
    if radius < 0:
        raise ValueError("radius must be >= 0")
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    t0 = time.monotonic()
    # contributions flow dst -> src: reuse the cached CSC layout
    # (edges keyed/partitioned by original dst), built once per graph.
    rev = graph.reversed_layout().edges

    state = (
        vertex_registers(graph.vertices, m=m, seed=seed)
        .repartition(n_part, "v")
        .localCheckpoint(eager=True)
    )
    metrics: list[dict] = []
    prev_sig: tuple[int, int] | None = None
    converged = False

    def round_metrics(st: DataFrame, t: int) -> dict:
        row = st.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("rho").alias("sum_rho")
        ).collect()[0]
        npairs = ball_estimates(st, m=m).agg(
            F.sum("ball_est").alias("n")
        ).collect()[0]["n"]
        return {
            "iteration": t,
            "register_rows": row["rows"],
            "sum_rho": row["sum_rho"],
            "n_pairs_est": int(npairs),
        }

    metrics.append(round_metrics(state, 0))
    prev_sig = (metrics[0]["register_rows"], metrics[0]["sum_rho"])
    for t in range(1, radius + 1):
        contrib = state.join(rev, state["v"] == rev["src"]).select(
            rev["dst"].alias("v"), "j", "rho"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("v", "j")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        metrics.append(round_metrics(state, t))
        sig = (metrics[-1]["register_rows"], metrics[-1]["sum_rho"])
        # max-merge is monotone in both rows and sum(rho): equality
        # of the two scalars == identical table == closure reached.
        if sig == prev_sig:
            converged = True
            if early_stop:
                break
        prev_sig = sig
    return IterationResult(
        state=state,
        iterations=len(metrics) - 1,
        converged=converged,
        metrics=metrics,
        elapsed_sec=time.monotonic() - t0,
    )


def neighborhood_function(
    graph: EdgeTable, max_radius: int = 32, m: int = 16, seed: str = "anf"
) -> DataFrame:
    """DataFrame[t int, n_pairs_est long] for t = 0..max_radius:
    the approximate neighborhood function. Rounds past closure repeat
    the converged value (N is monotone and saturates), so a fixed
    ``max_radius`` always yields max_radius+1 rows — the shape a
    fixed-round SQL oracle replays.

    Pure-DataFrame construction: each round's per-vertex estimates are
    aggregated and unioned with a literal t — no driver-side collect
    of per-vertex data (the per-round scalars in ``anf_registers``
    metrics are the engine's usual stop-metric class)."""
    if max_radius < 0:
        raise ValueError("max_radius must be >= 0")
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    rev = graph.reversed_layout().edges
    state = (
        vertex_registers(graph.vertices, m=m, seed=seed)
        .repartition(n_part, "v")
        .localCheckpoint(eager=True)
    )

    def level(st: DataFrame, t: int) -> DataFrame:
        return ball_estimates(st, m=m).agg(
            F.sum("ball_est").alias("n_pairs_est")
        ).select(F.lit(t).cast("int").alias("t"), "n_pairs_est")

    out = level(state, 0)
    for t in range(1, max_radius + 1):
        contrib = state.join(rev, state["v"] == rev["src"]).select(
            rev["dst"].alias("v"), "j", "rho"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("v", "j")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(level(state, t))
    return out


def hyperball_centralities(
    graph: EdgeTable, radius: int = 8, m: int = 16, seed: str = "anf"
) -> DataFrame:
    """DataFrame[v, harmonic double, sum_dist long]: HyperBall
    distance-based centralities (Boldi-Vigna, "In-core computation of
    geometric centralities with HyperBall", ICDMW 2013) from INCOMING
    ball sizes — b_t(v) sketches |{u : dist(u, v) <= t}|, grown by
    max-merging each edge's src counter into its dst (the reverse of
    the ANF direction, so the FORWARD cached edge layout co-locates
    the join):

        harmonic(v) = Σ_{t=1..radius} (b_t - b_{t-1}) / t
                      ≈ Σ_{u != v} 1 / dist(u, v)
        sum_dist(v) = Σ_{t=1..radius} t · (b_t - b_{t-1})
                      ≈ Σ_{u reaching v} dist(u, v)

    b_t are the rounded integer HLL estimates, so sum_dist is exact
    integer arithmetic and harmonic is a fixed left-to-right chain of
    integer/int divisions — both SQL-replayable. Note b_t is monotone
    in the REGISTERS but the rounded estimate can dip by one at the
    linear-counting -> raw branch switch; HyperBall uses the raw
    differences unchanged (a |1/t| ripple inside the sketch's error
    bar), and so do we — determinism, not clamping, is the contract.

    Scale: radius rounds of the same |E|-contribution join +
    partial-max merge as ANF, plus radius |V|-row estimate joins.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    edges = graph.edges

    state = (
        vertex_registers(graph.vertices, m=m, seed=seed)
        .repartition(n_part, "v")
        .localCheckpoint(eager=True)
    )
    prev = ball_estimates(state, m=m).withColumnRenamed("ball_est", "b_prev")
    acc = prev.select(
        "v",
        F.lit(0.0).alias("harmonic"),
        F.lit(0).cast("long").alias("sum_dist"),
        "b_prev",
    ).localCheckpoint(eager=True)
    for t in range(1, radius + 1):
        contrib = state.join(edges, state["v"] == edges["src"]).select(
            edges["dst"].alias("v"), "j", "rho"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("v", "j")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        est = ball_estimates(state, m=m)
        delta = F.col("ball_est") - F.col("b_prev")
        acc = (
            acc.join(est, "v")
            .select(
                "v",
                (F.col("harmonic") + delta.cast("double") / F.lit(float(t))).alias(
                    "harmonic"
                ),
                (F.col("sum_dist") + F.lit(t) * delta).cast("long").alias("sum_dist"),
                F.col("ball_est").alias("b_prev"),
            )
            .localCheckpoint(eager=True)
        )
    return acc.select("v", "harmonic", "sum_dist", F.col("b_prev").alias("ball"))


def closeness_centralities(
    graph: EdgeTable, radius: int = 8, m: int = 16, seed: str = "anf"
) -> DataFrame:
    """DataFrame[v, closeness double, lin double, sum_dist long]:
    closeness and Lin's centrality from the same HyperBall pass as
    :func:`hyperball_centralities` (Boldi-Vigna ICDMW 2013 §2) —
    with r(v) = |ball_radius(v)| the (rounded-integer) count of
    vertices reaching v within ``radius`` and sum_dist(v) their
    summed distances:

        closeness(v) = (r - 1) / sum_dist        (0 when sum_dist = 0)
        lin(v)       = (r - 1)^2 / sum_dist      (1 when sum_dist = 0,
                                                  the Boldi-Vigna
                                                  isolated-vertex
                                                  convention)

    Lin's index corrects closeness's small-component bias (a vertex
    reached only by one close neighbor would otherwise out-rank the
    core of the giant component) — the variant actually usable for
    ranking pages on a disconnected web graph. Both are exact-integer
    ratios of the deterministic sketch estimates, so the SQL oracle
    reproduces them bit-for-bit. Same cost as the harmonic pass: this
    IS the harmonic pass plus a projection.
    """
    hc = hyperball_centralities(graph, radius=radius, m=m, seed=seed)
    reached = (F.col("ball") - 1).cast("long")
    return hc.select(
        "v",
        F.when(
            F.col("sum_dist") > 0,
            reached.cast("double") / F.col("sum_dist").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
        F.when(
            F.col("sum_dist") > 0,
            (reached * reached).cast("double") / F.col("sum_dist").cast("double"),
        )
        .otherwise(F.lit(1.0))
        .alias("lin"),
        "sum_dist",
    )


def distance_histogram(nf: DataFrame) -> DataFrame:
    """DataFrame[t int, n_pairs_at_t long]: the approximate distance
    distribution — first differences of the neighborhood function,
    n_pairs_at_t = N(t) - N(t-1) with N(-1) = 0 (the "degrees of
    separation" histogram of Boldi-Rosa-Vigna's four-degrees study).
    Pure projection over the <= max_radius+1-row nf table: one
    self-join on consecutive t, exact BIGINT subtraction — no extra
    pass over the graph, SQL-replayable bit-for-bit."""
    prev = nf.select(
        F.col("t").alias("_pt"), F.col("n_pairs_est").alias("_pn")
    )
    return nf.join(prev, nf["t"] == prev["_pt"] + 1, "left").select(
        "t",
        (F.col("n_pairs_est") - F.coalesce(F.col("_pn"), F.lit(0)))
        .cast("long")
        .alias("n_pairs_at_t"),
    )


def effective_diameter_df(nf: DataFrame, alpha: float = 0.9) -> DataFrame:
    """One-row DataFrame[alpha double, eff_diameter double]: the
    DataFrame-native twin of :func:`effective_diameter` — the linearly
    interpolated radius at which N(t) first reaches ``alpha`` of its
    saturation value, computed declaratively so driver harnesses can
    consume it as a query result. The float chain is a fixed
    left-to-right sequence over exact BIGINT inputs (target =
    alpha * max(N); interp = (t-1) + (target - N(t-1)) / (N(t) -
    N(t-1))), so a SQL oracle replays it bit-for-bit. The windows run
    over the <= max_radius+1-row nf table — driver-scale data, not
    graph-scale."""
    from pyspark.sql.window import Window

    w_ord = Window.orderBy("t")
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    aug = nf.select(
        "t",
        "n_pairs_est",
        F.coalesce(
            F.lag("n_pairs_est").over(w_ord), F.lit(0).cast("long")
        ).alias("n_prev"),
        F.max("n_pairs_est").over(w_all).alias("n_max"),
    )
    target = F.lit(alpha) * F.col("n_max").cast("double")
    # first t with N(t) >= target: N is monotone, so n_prev < target
    # there and the interpolation denominator is strictly positive.
    first = (
        aug.where(F.col("n_pairs_est").cast("double") >= target)
        .orderBy("t")
        .limit(1)
    )
    eff = F.when(F.col("t") == 0, F.lit(0.0)).otherwise(
        (F.col("t") - 1).cast("double")
        + (target - F.col("n_prev").cast("double"))
        / (F.col("n_pairs_est") - F.col("n_prev")).cast("double")
    )
    return first.select(
        F.lit(alpha).alias("alpha"), F.round(eff, 6).alias("eff_diameter")
    )


def effective_diameter(
    nf: DataFrame | list[tuple[int, int]], alpha: float = 0.9
) -> float:
    """The ANF effective diameter: the (linearly interpolated) radius
    t at which N(t) first reaches ``alpha`` of its saturation value
    (Palmer et al. 2002 §3; Boldi-Rosa-Vigna report alpha=0.9).
    Driver-side over the <= max_radius+1-row nf table."""
    if isinstance(nf, DataFrame):
        rows = [(r["t"], r["n_pairs_est"]) for r in nf.collect()]
    else:
        rows = list(nf)
    rows.sort()
    if not rows:
        raise ValueError("empty neighborhood function")
    target = alpha * rows[-1][1]
    prev_t, prev_n = rows[0]
    if prev_n >= target:
        return float(prev_t)
    for t, n in rows[1:]:
        if n >= target:
            if n == prev_n:
                return float(t)
            return prev_t + (target - prev_n) / (n - prev_n) * (t - prev_t)
        prev_t, prev_n = t, n
    return float(rows[-1][0])
