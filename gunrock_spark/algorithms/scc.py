"""Strongly connected components + Broder bowtie decomposition.

The reference ships weakly-connected components only (gunrock/app/cc/,
hash-min hooking + pointer jumping, cc_functor.cuh:179-193,544-560);
for a DIRECTED web link graph the strongly-connected structure is the
headline analysis (Broder et al., "Graph structure in the Web", WWW
2000 — the bowtie: giant SCC core, IN, OUT, tendrils). This module
supplies both, built from the engine's existing advance machinery.

Algorithm — trim + forward coloring + backward containment (the
Orzan / Slota-Rajamanickam "ColorSCC" family, chosen over recursive
FW-BW because every phase is a whole-graph DataFrame pass rather than
a driver-side recursion over sub-partitions):

  outer round over the ACTIVE (unassigned) vertex set:
    1. TRIM to fixpoint: a vertex with in-degree 0 or out-degree 0
       within the active subgraph is a singleton SCC (scc = own id);
       peeling repeats until stable. This alone dissolves the web
       bowtie's IN/OUT tendrils, which dominate |V|.
    2. COLOR forward to fixpoint: color(v) = min vertex id that
       reaches v within the active subgraph — directed hash-min
       (color(dst) := min over in-neighbors' colors) accelerated by
       pointer doubling through the previous materialized state
       (valid because "u reaches v" is transitive: if color(v)=c and
       color(c)=c' then c' reaches v), the same doubling the CC loop
       uses (components.py).
    3. ASSIGN: roots are vertices with color(v) == v. The SCC of root
       r is exactly the set backward-reachable from r WITHIN color
       class r (if color(v)=r and v reaches r, then v and r are
       mutually reachable). One backward BFS from all roots at once,
       constrained to same-color edges, marks every discovered vertex
       scc = its color.
    4. Remove assigned vertices; repeat until active is empty.

Label canonicality: scc(v) = the MINIMUM vertex id in v's SCC,
independent of round structure — for root r, color(r) = r means no
smaller active vertex reaches r, and every SCC member reaches every
other, so r is the component minimum. Trim-assigned singletons label
themselves. Deterministic across engines/cluster sizes/round counts,
hence oracle-able declaratively (DuckDB transitive closure) with no
unrolling.

Scale notes (100 TB link graph): every phase is |E_active| semi-joins
plus partial-agg min/exists — no all-pairs anything. The active edge
set is re-materialized (localCheckpoint) once per phase and SHRINKS
monotonically: trim removes the tendril mass first, the giant core is
assigned in outer round 1 (its minimum id colors it and the backward
sweep claims it), and later rounds run on the leftover small SCCs.
Backward traversal reuses the edge table reversed once per outer
round. Worst case (a long path with no trimmable ends — impossible:
a DAG always has a source) is bounded by max_outer.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.engine.iterate import IterationResult
from gunrock_spark.graph.edge_table import EdgeTable


def _checkpoint(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    graph: EdgeTable,
    max_outer: int = 25,
    max_inner: int = 100,
) -> IterationResult:
    """SCC labels over the directed graph.

    Returns ``result.state`` = DataFrame[v long, scc long] over all
    vertices; ``scc`` = minimum vertex id in v's strongly connected
    component. ``result.metrics`` records per-outer-round trim /
    color / sweep iteration counts and assigned-vertex counts.
    """
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    t0 = time.monotonic()

    # active subgraph, re-materialized as it shrinks
    edges = _checkpoint(
        graph.edges.select("src", "dst").repartition(n_part, "src")
    )
    active = _checkpoint(graph.vertices.select("v").repartition(n_part, "v"))
    assigned_parts: list[DataFrame] = []
    metrics: list[dict] = []
    converged = False

    for outer in range(max_outer):
        round_m: dict = {"iteration": outer}

        # ---- 1. trim to fixpoint -----------------------------------
        trim_rounds = 0
        for _ in range(max_inner):
            outd = edges.groupBy(F.col("src").alias("v")).agg(
                F.count(F.lit(1)).alias("outd")
            )
            ind = edges.groupBy(F.col("dst").alias("v")).agg(
                F.count(F.lit(1)).alias("ind")
            )
            trivial = _checkpoint(
                active.join(outd, "v", "left")
                .join(ind, "v", "left")
                .where(F.col("outd").isNull() | F.col("ind").isNull())
                .select("v")
            )
            n_triv = trivial.count()
            if n_triv == 0:
                break
            trim_rounds += 1
            assigned_parts.append(trivial.select("v", F.col("v").alias("scc")))
            active = _checkpoint(active.join(trivial, "v", "left_anti"))
            edges = _checkpoint(
                edges.join(trivial.withColumnRenamed("v", "src"), "src", "left_anti")
                .join(trivial.withColumnRenamed("v", "dst"), "dst", "left_anti")
            )
        round_m["trim_rounds"] = trim_rounds

        n_active = active.count()
        round_m["active"] = n_active
        if n_active == 0:
            metrics.append(round_m)
            converged = True
            break

        # ---- 2. forward coloring to fixpoint -----------------------
        # color(v) = min active vertex id reaching v; hash-min along
        # edge direction + pointer doubling through the materialized
        # previous state (components.py's contraction, directed).
        color = _checkpoint(active.select("v", F.col("v").alias("color")))
        color_rounds = 0
        for _ in range(max_inner):
            color_rounds += 1
            gathered = color.join(edges, color["v"] == edges["src"]).select(
                edges["dst"].alias("nv"), F.col("color")
            )
            nbr_min = gathered.groupBy(F.col("nv").alias("v")).agg(
                F.min("color").alias("nbr_min")
            )
            stepped = (
                color.join(nbr_min, "v", "left")
                .select(
                    "v",
                    F.least(
                        F.col("color"), F.coalesce("nbr_min", F.col("color"))
                    ).alias("color"),
                    F.col("color").alias("old"),
                )
            )
            # pointer doubling: color := min(color, color-of-color),
            # valid by reach-transitivity (module docstring)
            ptr = color.select(
                F.col("v").alias("pv"), F.col("color").alias("pcolor")
            )
            new = _checkpoint(
                stepped.join(ptr, stepped["color"] == ptr["pv"], "left")
                .select(
                    "v",
                    F.least(
                        F.col("color"), F.coalesce("pcolor", F.col("color"))
                    ).alias("color"),
                    "old",
                )
            )
            changed = new.where(F.col("color") != F.col("old")).count()
            color = new.select("v", "color")
            if changed == 0:
                break
        round_m["color_rounds"] = color_rounds

        # ---- 3. backward containment sweep -------------------------
        # roots: color(v) == v. BFS over REVERSED edges, restricted to
        # edges whose BOTH endpoints share the frontier's color.
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).repartition(n_part, "src")
        # same-color reversed edges, built once per outer round
        csrc = color.select(F.col("v").alias("src"), F.col("color").alias("c1"))
        cdst = color.select(F.col("v").alias("dst"), F.col("color").alias("c2"))
        rev_cc = _checkpoint(
            rev.join(csrc, "src").join(cdst, "dst")
            .where(F.col("c1") == F.col("c2"))
            .select("src", "dst")
        )
        visited = _checkpoint(
            color.where(F.col("v") == F.col("color")).select("v", "color")
        )
        frontier = visited
        sweep_rounds = 0
        for _ in range(max_inner):
            nxt = _checkpoint(
                frontier.join(rev_cc, frontier["v"] == rev_cc["src"])
                .select(rev_cc["dst"].alias("v"), F.col("color"))
                .distinct()
                .join(visited.select("v"), "v", "left_anti")
            )
            if nxt.count() == 0:
                break
            sweep_rounds += 1
            visited = _checkpoint(visited.unionByName(nxt))
            frontier = nxt
        round_m["sweep_rounds"] = sweep_rounds

        assigned_parts.append(visited.select("v", F.col("color").alias("scc")))
        n_assigned = visited.count()
        round_m["assigned"] = n_assigned

        active = _checkpoint(active.join(visited.select("v"), "v", "left_anti"))
        edges = _checkpoint(
            edges.join(
                visited.select(F.col("v").alias("src")), "src", "left_anti"
            ).join(visited.select(F.col("v").alias("dst")), "dst", "left_anti")
        )
        metrics.append(round_m)
        if active.count() == 0:
            converged = True
            break

    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    # any residual active vertices (max_outer hit) keep their own id —
    # an upper-bound label, flagged by converged=False
    if not converged:
        out = out.unionByName(active.select("v", F.col("v").alias("scc")))
    state = _checkpoint(out.repartition(n_part, "v"))
    return IterationResult(
        state=state,
        iterations=len(metrics),
        converged=converged,
        metrics=metrics,
        elapsed_sec=time.monotonic() - t0,
    )


CORE, IN, OUT, OTHER = "core", "in", "out", "other"


def bowtie_decomposition(
    graph: EdgeTable,
    scc_labels: DataFrame | None = None,
    max_inner: int = 100,
) -> DataFrame:
    """Broder bowtie partition of a directed web graph.

    Returns DataFrame[v long, part string]: ``core`` = the largest SCC
    (ties broken by smaller label), ``in`` = reaches the core but is
    outside it, ``out`` = reachable from the core, ``other`` = the
    rest (tendrils, tubes, disconnected).

    Reachability to/from the core is two frontier BFS sweeps from the
    whole core set at once (the core is one SCC, so reaching any
    member = reaching all), reusing the same advance shape as
    algorithms/bfs.py — |frontier ⋈ E| per level, anti-join dedup.
    """
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    if scc_labels is None:
        scc_labels = strongly_connected_components(graph).state
    labels = scc_labels.select("v", "scc")

    top = (
        labels.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()
    )
    core_label = top[0]["scc"]

    core = _checkpoint(
        labels.where(F.col("scc") == F.lit(core_label)).select("v")
    )
    edges = graph.edges.select("src", "dst")

    def reach_from(seed: DataFrame, edge_df: DataFrame) -> DataFrame:
        """Vertices reachable from seed (seed included) via edge_df."""
        visited = _checkpoint(seed.select("v"))
        frontier = visited
        for _ in range(max_inner):
            nxt = _checkpoint(
                frontier.join(edge_df, frontier["v"] == edge_df["src"])
                .select(edge_df["dst"].alias("v"))
                .distinct()
                .join(visited, "v", "left_anti")
            )
            if nxt.count() == 0:
                break
            visited = _checkpoint(visited.unionByName(nxt))
            frontier = nxt
        return visited

    fwd = reach_from(core, edges.repartition(n_part, "src"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = reach_from(core, rev.repartition(n_part, "src"))

    return (
        graph.vertices.select("v")
        .join(core.select("v", F.lit(1).alias("_core")), "v", "left")
        .join(fwd.select("v", F.lit(1).alias("_fwd")), "v", "left")
        .join(bwd.select("v", F.lit(1).alias("_bwd")), "v", "left")
        .select(
            "v",
            F.when(F.col("_core").isNotNull(), F.lit(CORE))
            .when(F.col("_bwd").isNotNull(), F.lit(IN))
            .when(F.col("_fwd").isNotNull(), F.lit(OUT))
            .otherwise(F.lit(OTHER))
            .alias("part"),
        )
    )
