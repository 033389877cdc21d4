"""Whole-graph structure statistics — local clustering coefficients,
global transitivity, edge reciprocity, degree assortativity.

The reference reports per-run structural diagnostics next to every
primitive (search depth / nodes visited in the JSON info blob,
gunrock/util/info.cuh; TC's per-vertex counts, app/tc/tc_problem.cuh)
but stops short of the normalized statistics an analyst derives from
them. These four are the standard link-graph characterization suite
(Watts-Strogatz clustering, Newman assortativity/reciprocity) and
each is ONE partial-agg pass over tables the engine already caches —
no new shuffle shapes.

Determinism contract: every statistic is computed from EXACT integer
sums (counts, Σd, Σd², Σ d_src·d_dst as BIGINT) with a single float
expression at the end, so the value is bit-identical across partition
orders and engines — no float accumulation (Spark's corr/variance
merge formulas are partition-order-sensitive in the last ulps, which
would break the value-hash oracle gate).

Scale notes (100 TB link graph): all four are scan + groupBy shapes —
map-side partial aggregation absorbs power-law skew exactly as in
degree_histogram; reciprocity's self-join is the symmetrized-edge
equi-join every CC iteration already runs; local clustering reuses
the triangle corner counts (join or blocks path), adding one |V|-row
join against the degree table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.algorithms.triangles import triangle_count_per_vertex
from gunrock_spark.graph.edge_table import EdgeTable


def _simple_undirected(graph: EdgeTable) -> DataFrame:
    """Canonical simple undirected edge set DataFrame[a, b], a < b
    (self-loops dropped, direction and multiplicity collapsed)."""
    return (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _undirected_degrees(graph: EdgeTable) -> DataFrame:
    """DataFrame[v, deg] — simple undirected degree (distinct
    neighbors, self excluded)."""
    und = _simple_undirected(graph)
    return (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def local_clustering(graph: EdgeTable) -> DataFrame:
    """DataFrame[v, n_triangles, deg, lcc] — Watts-Strogatz local
    clustering coefficient per vertex over the simple undirected
    graph: lcc(v) = 2·T(v) / (deg(v)·(deg(v)-1)), 0.0 when deg < 2.

    T(v) comes from the engine's triangle corner counts (wedge join
    below the auto threshold, CSR blocks above — triangles.py), so the
    scale path is the blocks kernel; this adds one |V|-row join.
    """
    tri = triangle_count_per_vertex(graph)
    deg = _undirected_degrees(graph)
    lcc = F.when(
        F.col("deg") >= 2,
        2.0 * F.col("n_triangles") / (F.col("deg") * (F.col("deg") - F.lit(1))),
    ).otherwise(F.lit(0.0))
    return tri.join(deg, "v", "left").select(
        "v",
        "n_triangles",
        F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
        lcc.cast("double").alias("lcc"),
    )


def transitivity(graph: EdgeTable) -> DataFrame:
    """One row (n_triangles, n_wedges, transitivity) — global
    transitivity 3·T / W, W = Σ_v deg(v)·(deg(v)-1)/2 over the simple
    undirected graph (the "fraction of wedges that close"). Exact
    integer T and W; one float division."""
    deg = _undirected_degrees(graph)
    wedges = deg.agg(
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long")).alias("n_wedges")
    )
    tri = triangle_count_per_vertex(graph).agg(
        (F.sum("n_triangles") / 3).cast("long").alias("n_triangles")
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0, 3.0 * F.col("n_triangles") / F.col("n_wedges")
        )
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("transitivity"),
    )


def reciprocity(graph: EdgeTable) -> DataFrame:
    """One row (n_reciprocated, n_edges, reciprocity) — the fraction
    of distinct directed non-loop edges u→v whose reverse v→u also
    exists (Newman's r). The probe is one equi-join of the distinct
    edge set against its own transpose — the same shuffle shape as a
    CC iteration, partial-agg counted."""
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_reciprocated")
    )
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return recip.crossJoin(tot).select(
        "n_reciprocated",
        "n_edges",
        F.when(F.col("n_edges") > 0, F.col("n_reciprocated") / F.col("n_edges"))
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("reciprocity"),
    )


def degree_assortativity(graph: EdgeTable) -> DataFrame:
    """One row (m2, sum_j, sum_jk, sum_j2, assortativity) — Newman's
    degree assortativity: the Pearson correlation of endpoint degrees
    over the symmetrized simple edge list (each undirected edge
    counted in both directions, so the j/k marginals coincide and

        r = (m·Σjk − (Σj)²) / (m·Σj² − (Σj)²)

    with m = 2·|E_und| directed copies). The sums accumulate in
    decimal(38,0) — EXACT at any graph size (a 10¹²-edge graph with
    10⁷-degree hubs pushes Σjk past int64; decimal keeps it exact, as
    DuckDB's HUGEINT sum does on the oracle side) — and one float
    expression at the end, so the value is partition-order-invariant.
    The reported sums are cast to long for the result schema."""
    und = _simple_undirected(graph)
    deg = _undirected_degrees(graph)
    both = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    dj = deg.select(F.col("v").alias("a"), F.col("deg").alias("j"))
    dk = deg.select(F.col("v").alias("b"), F.col("deg").alias("k"))
    dec = "decimal(38,0)"
    sums = (
        both.join(dj, "a")
        .join(dk, "b")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("m2"),
            F.sum(F.col("j").cast(dec)).alias("sum_j"),
            F.sum(F.col("j").cast(dec) * F.col("k")).alias("sum_jk"),
            F.sum(F.col("j").cast(dec) * F.col("j")).alias("sum_j2"),
        )
    )
    # scalar combination on the single aggregated row happens in
    # double (decimal×decimal at precision 38 would overflow-throw
    # under ANSI on extreme inputs; the output is a double anyway)
    m2d, sjd = F.col("m2").cast("double"), F.col("sum_j").cast("double")
    num = m2d * F.col("sum_jk").cast("double") - sjd * sjd
    den = m2d * F.col("sum_j2").cast("double") - sjd * sjd
    return sums.select(
        F.col("m2").cast("long").alias("m2"),
        F.col("sum_j").cast("long").alias("sum_j"),
        F.col("sum_jk").cast("long").alias("sum_jk"),
        F.col("sum_j2").cast("long").alias("sum_j2"),
        F.when(den != 0, num / den).otherwise(F.lit(0.0)).alias("assortativity"),
    )


def powerlaw_alpha(graph: EdgeTable, x_min: int = 2) -> DataFrame:
    """One row (n_tail, x_min, alpha) — the discrete power-law
    exponent of the undirected degree distribution by the
    Clauset-Shalizi-Newman MLE approximation

        alpha ~= 1 + n / SUM_{d >= x_min} ln(d / (x_min - 0.5))

    the standard one-pass check that a crawl's link graph kept its
    expected heavy tail (alpha ~2.1 for the web). One partial-agg
    aggregate over the cached degree table; the log-sum is a double
    reduction (order-sensitive in the last ulp — the driver query
    rounds; every other gstats output is exact-integer-derived).
    """
    deg = _undirected_degrees(graph).where(F.col("deg") >= x_min)
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.lit(x_min).cast("long").alias("x_min"),
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("deg") / F.lit(x_min - 0.5)))
        ).alias("alpha"),
    )


def diameter_double_sweep(graph: EdgeTable, source: int | None = None) -> DataFrame:
    """One row (start_v, far_v, diameter_lb): the standard double-sweep
    diameter LOWER BOUND (Magnien-Latapy-Habib 2009) over the
    UNDIRECTED graph — BFS from a start vertex, hop to the farthest
    reached vertex (ties: smallest id), BFS again; the second
    eccentricity lower-bounds the diameter and is usually tight on
    web/power-law graphs. Two level-synchronous BFS runs = ~2·diameter
    PR-iteration-class shuffles; for the full distance distribution
    use HyperANF (algorithms/anf.py), which bounds work independent
    of source choice."""
    from gunrock_spark.algorithms.bfs import bfs

    sym = graph.symmetrized()
    if source is None:
        source = sym.vertices.agg(F.min("v")).collect()[0][0]
    first = bfs(sym, int(source)).state
    far = first.agg(
        F.max(F.struct(F.col("depth"), (-F.col("v")).alias("nv"))).alias("t")
    ).collect()[0]["t"]
    far_v = -int(far["nv"])
    second = bfs(sym, far_v).state
    ecc = second.agg(F.max("depth")).collect()[0][0]
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(int(source), far_v, int(ecc))],
        schema="start_v long, far_v long, diameter_lb long",
    )


def avg_neighbor_degree(graph: EdgeTable) -> DataFrame:
    """DataFrame[degree, avg_nbr_degree, n_vertices]: the degree
    correlation profile knn(k) (Pastor-Satorras et al. 2001) over the
    simple undirected graph — for each undirected degree k, the
    degree-weighted mean neighbor degree (sum of neighbor degrees over
    sum of edge endpoints in the class — one exact-integer ratio). The
    standard one-plot summary of assortative mixing (flat = neutral,
    rising = assortative); complements the scalar Newman coefficient
    (degree_assortativity).

    Exact-integer plan: undirected degrees once (|E|-row partial agg),
    one |E|-row join to pair each endpoint with its neighbor's degree,
    per-vertex integer sums, then per-degree-class means — every
    exchange partial-aggregable, floats only in the final division."""
    und = _simple_undirected(graph)
    deg = _undirected_degrees(graph)
    both = und.select(
        F.col("a").alias("v"), F.col("b").alias("u")
    ).unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
    nbr_deg = both.join(
        deg.select(F.col("v").alias("u"), F.col("deg").alias("u_deg")), "u"
    )
    per_v = nbr_deg.groupBy("v").agg(
        F.sum("u_deg").alias("s"), F.count(F.lit(1)).alias("d")
    )
    per_v = per_v.join(deg, "v").select(
        F.col("deg").alias("degree"), "s", "d"
    )
    # class mean as ONE division of two exact integer sums (the
    # degree-weighted knn variant): sum-of-doubles averaging would be
    # partition-order-dependent and break cross-engine equality
    return per_v.groupBy("degree").agg(
        F.round(F.sum("s") / F.sum("d"), 6).alias("avg_nbr_degree"),
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
    )


def rich_club(graph: EdgeTable) -> DataFrame:
    """Rich-club coefficient curve (Zhou & Mondragon 2004):
    DataFrame[k long, n_k long, e_k long, phi double] for every degree
    value k present in the graph with at least 2 richer-than-k
    vertices, where ``n_k`` = #{v : deg(v) > k}, ``e_k`` = number of
    simple undirected edges with BOTH endpoints of degree > k, and
    ``phi = 2*e_k / (n_k*(n_k-1))`` — how densely the high-degree core
    is wired to itself (the "do hubs club together" question every
    web-graph study asks).

    Exact-integer plan, no per-k passes: one |E|-row join tags each
    undirected edge with m = min(deg(a), deg(b)); e_k for ALL k comes
    from one groupBy(m).count + a descending cumulative sum; n_k from
    the degree histogram the same way. The only windows run over the
    DISTINCT-degree rows (bounded by max degree, in practice a few
    hundred on a power-law graph — never |V| or |E| rows), so the plan
    is two partial-agg shuffles + two bounded window passes. phi is
    one float division over exact BIGINTs — bit-identical across
    engines and partition orders.
    """
    from pyspark.sql import Window

    und = _simple_undirected(graph)
    deg = _undirected_degrees(graph)

    # vertex-degree histogram and edge min-endpoint-degree histogram,
    # merged onto ONE spine of k values so the strict ">" cumulative
    # sums see every level (a degree value that is never an edge's min
    # must still inherit the count of all larger-min edges).
    hist = deg.groupBy(F.col("deg").alias("k")).agg(
        F.count(F.lit(1)).alias("n_at")
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    edge_min = (
        und.join(da, "a")
        .join(db, "b")
        .select(F.least("dega", "degb").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_at"))
    )
    spine = hist.join(edge_min, "k", "full_outer").select(
        "k",
        F.coalesce("n_at", F.lit(0)).alias("n_at"),
        F.coalesce("e_at", F.lit(0)).alias("e_at"),
    )
    w = Window.orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = spine.select(
        "k",
        "n_at",
        F.coalesce(F.sum("n_at").over(w), F.lit(0)).cast("long").alias("n_k"),
        F.coalesce(F.sum("e_at").over(w), F.lit(0)).cast("long").alias("e_k"),
    )
    return (
        cum.where((F.col("n_at") > 0) & (F.col("n_k") >= 2))
        .select(
            "k",
            "n_k",
            "e_k",
            F.round(
                (2.0 * F.col("e_k"))
                / (F.col("n_k") * (F.col("n_k") - F.lit(1))),
                9,
            ).alias("phi"),
        )
        .orderBy("k")
    )
