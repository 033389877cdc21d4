"""Subgraph matching — candidate-edge join chain with injectivity.

Re-creates the semantics of the reference's subgraph-match join
kernels (gunrock/util/join.cuh — the only part of the SM primitive
present in this fork): ``Join`` (join.cuh:115-215) extends each
partial match (one data edge per already-processed query edge) with
candidate data edges for the next query edge, keeping a candidate iff
  - shared query vertices map to the same data vertex (the
    ``intersect`` checks, join.cuh:158-175/185-200), and
  - query vertices with NO intersection map to a data vertex distinct
    from every already-matched one (the ``else`` loops rejecting
    equal endpoints, join.cuh:176-183/201-211 — vertex injectivity);
``Collect`` (join.cuh:225+) compacts surviving matches.

Spark plan: a left-deep chain of |pattern| equi-joins over the edge
DataFrame — each query edge joins the (growing) partial-match
relation to a fresh alias of the edge table on the bound endpoint(s),
then filters injectivity for newly bound vertices. Catalyst plans
each step as a shuffle (or broadcast, small side) hash join keyed on
the bound vertex; the edge table's src hash-partitioning is reused
where the join key is src. Partial-match cardinality, not |E|,
dominates — the same cost model as the reference's
candidate-count-driven ``pos``/``counts`` bookkeeping.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def subgraph_match(
    graph: EdgeTable,
    pattern: list[tuple[int, int]],
    undirected: bool = False,
) -> DataFrame:
    """Enumerate vertex-injective embeddings of ``pattern`` (a list of
    (a, b) query edges over small-int query vertex ids; must be
    connected in processing order — each edge after the first shares a
    vertex with an earlier one, as the reference's candidate order
    assumes). Returns DataFrame[u0, u1, ... u{k-1}] — the data vertex
    matched to each query vertex, one row per embedding.

    ``undirected=True`` matches against the symmetrized edge view
    (each data edge usable in both orientations).
    """
    if not pattern:
        raise ValueError("pattern must contain at least one edge")
    base = (graph.symmetrized() if undirected else graph).edges.select("src", "dst")

    qverts: list[int] = sorted({v for e in pattern for v in e})
    bound: set[int] = set()
    result: DataFrame | None = None

    for i, (a, b) in enumerate(pattern):
        if a == b:
            raise ValueError(f"pattern edge {i} is a self-loop ({a},{b})")
        e = base.select(
            F.col("src").alias(f"_s{i}"), F.col("dst").alias(f"_d{i}")
        )
        if result is None:
            result = e.select(
                F.col(f"_s{i}").alias(f"u{a}"), F.col(f"_d{i}").alias(f"u{b}")
            )
            newly = [a, b]
        else:
            conds = []
            if a in bound:
                conds.append(e[f"_s{i}"] == result[f"u{a}"])
            if b in bound:
                conds.append(e[f"_d{i}"] == result[f"u{b}"])
            if not conds:
                raise ValueError(
                    f"pattern edge {i} ({a},{b}) shares no vertex with "
                    "earlier edges — reorder the pattern so it stays connected"
                )
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c
            result = result.join(e, cond)
            newly = []
            if a not in bound:
                result = result.withColumnRenamed(f"_s{i}", f"u{a}")
                newly.append(a)
            if b not in bound:
                result = result.withColumnRenamed(f"_d{i}", f"u{b}")
                newly.append(b)
            result = result.select(
                *[f"u{v}" for v in sorted(bound | set(newly))]
            )
        # vertex injectivity for newly bound query vertices (the
        # reference's reject-if-equal-to-any-matched loops)
        for nv in newly:
            for ov in bound:
                result = result.where(F.col(f"u{nv}") != F.col(f"u{ov}"))
            bound.add(nv)

    # no duplicate pattern edges assumed; distinct embeddings are
    # already unique because every query vertex is a distinct column
    return result.select(*[f"u{v}" for v in qverts])


def subgraph_match_count(
    graph: EdgeTable,
    pattern: list[tuple[int, int]],
    undirected: bool = False,
) -> DataFrame:
    """1-row DataFrame[n_matches] — embedding count (the reference
    reports match counts per query via ``counts``, join.cuh:133)."""
    return subgraph_match(graph, pattern, undirected=undirected).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )
