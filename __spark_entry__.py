"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the engine's public API (EdgeTable +
algorithm functions) over a link graph derived deterministically from
the testdata parquet (see gunrock_spark/sources/tables.py for the
shared derivation contract); ``oracle_sql()`` re-states each query as
ANSI SQL DuckDB runs on the same parquet views. Iterative algorithms
get exact unrolled-CTE oracles (fixed-k runs) or recursive-CTE
oracles (converged runs whose fixpoint is order-independent).

Float columns are rounded to 6 decimals ON BOTH SIDES so the driver's
value hash is robust to summation-order ULP noise; the tighter
allclose(1e-6) parity asserts live in tests/ against numpy oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from gunrock_spark.algorithms.bc import bc_single_source
from gunrock_spark.algorithms.bfs import bfs
from gunrock_spark.algorithms.components import component_sizes, connected_components
from gunrock_spark.algorithms.hits import hits
from gunrock_spark.algorithms.label_propagation import label_propagation
from gunrock_spark.algorithms.pagerank import pagerank, ranked
from gunrock_spark.algorithms.salsa import salsa
from gunrock_spark.algorithms.sssp import sssp
from gunrock_spark.algorithms.triangles import (
    triangle_count_df,
    triangle_count_per_vertex,
)
from gunrock_spark.algorithms.wtf import who_to_follow
from gunrock_spark.sources.tables import EDGE_MOD, derived_edge_table

# ---------------------------------------------------------------------------
# shared SQL prologue — MUST stay in lockstep with
# gunrock_spark/sources/tables.py::derived_edges_df + EdgeTable cleaning
# ---------------------------------------------------------------------------

_EDGES_CTES = f"""
raw AS MATERIALIZED (
  SELECT CAST(o_orderkey % {EDGE_MOD} AS BIGINT) AS src,
         CAST((o_custkey * 31) % {EDGE_MOD} AS BIGINT) AS dst
  FROM orders
),
edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges),
deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
sym AS MATERIALIZED (SELECT src, dst FROM edges
        UNION
        SELECT dst AS src, src AS dst FROM edges)
"""

PR_FIXED_ITERS = 10
LP_MODE_ITERS = 3
TOPK_K = 20
HITS_ITERS = 5
SALSA_ITERS = 4
SSSP_ROUNDS = 20  # sf0.01 converges in 13 frontier rounds; margin
BFS_DEPTH_CAP = 30

# weighted derived edges (lockstep with sources.weighted_edges_df)
_WEDGES_CTE = """
edges_w AS MATERIALIZED (
  SELECT src, dst, CAST((src * 7 + dst * 13) % 19 + 1 AS DOUBLE) AS w FROM edges
),
srcv AS (SELECT MIN(v) AS s FROM verts),
indeg AS MATERIALIZED (SELECT dst AS v, CAST(COUNT(*) AS DOUBLE) AS ind FROM edges GROUP BY dst)
"""


def _pagerank_fixed_sql(k: int = PR_FIXED_ITERS, delta: float = 0.85) -> str:
    """k synchronous PR iterations, exactly the engine's update rule:
    new = (1-delta)/n + delta * sum_{u->v} rank(u)/out_degree(u)."""
    body = ["r0 AS (SELECT v, 1.0 / (SELECT COUNT(*) FROM verts) AS rank FROM verts)"]
    for i in range(1, k + 1):
        body.append(
            f"""r{i} AS MATERIALIZED (
  SELECT verts.v,
         (1.0 - {delta}) / (SELECT COUNT(*) FROM verts)
           + {delta} * COALESCE(s.msg, 0.0) AS rank
  FROM verts
  LEFT JOIN (
    SELECT e.dst AS v, SUM(r.rank / d.outd) AS msg
    FROM edges e
    JOIN r{i - 1} r ON r.v = e.src
    JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) s ON s.v = verts.v
)"""
        )
    return (
        "WITH "
        + _EDGES_CTES
        + ",\n"
        + ",\n".join(body)
        + f"\nSELECT v, ROUND(rank, 6) AS rank FROM r{k}"
    )


def _cc_sql() -> str:
    """Converged CC labels: min vertex id reachable in the undirected
    graph — the fixpoint of the engine's hash-min loop."""
    return (
        "WITH RECURSIVE "
        + _EDGES_CTES
        + """,
reach(v, label) AS (
  SELECT v, v AS label FROM verts
  UNION
  SELECT s.dst AS v, r.label FROM reach r JOIN sym s ON s.src = r.v
)
SELECT v, MIN(label) AS label FROM reach GROUP BY v"""
    )


def _component_sizes_sql() -> str:
    return (
        "WITH RECURSIVE "
        + _EDGES_CTES
        + """,
reach(v, label) AS (
  SELECT v, v AS label FROM verts
  UNION
  SELECT s.dst AS v, r.label FROM reach r JOIN sym s ON s.src = r.v
),
labels AS (SELECT v, MIN(label) AS label FROM reach GROUP BY v)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices FROM labels GROUP BY label"""
    )


def _lp_mode_sql(k: int = LP_MODE_ITERS) -> str:
    """k rounds of synchronous mode-label propagation over the
    undirected graph; ties -> smallest label (the engine's max_by on
    (count, -label))."""
    body = ["l0 AS (SELECT v, v AS label FROM verts)"]
    for i in range(1, k + 1):
        body.append(
            f"""l{i} AS MATERIALIZED (
  SELECT l.v, COALESCE(nb.new_label, l.label) AS label
  FROM l{i - 1} l
  LEFT JOIN (
    SELECT v, new_label FROM (
      SELECT s.dst AS v, p.label AS new_label,
             ROW_NUMBER() OVER (
               PARTITION BY s.dst
               ORDER BY COUNT(*) DESC, p.label ASC
             ) AS rn
      FROM sym s JOIN l{i - 1} p ON p.v = s.src
      GROUP BY s.dst, p.label
    ) t WHERE rn = 1
  ) nb ON nb.v = l.v
)"""
        )
    return (
        "WITH "
        + _EDGES_CTES
        + ",\n"
        + ",\n".join(body)
        + f"\nSELECT v, label FROM l{k}"
    )


_TRIANGLE_CTES = (
    _EDGES_CTES
    + """,
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)"""
)


def _triangles_total_sql() -> str:
    return "WITH " + _TRIANGLE_CTES + "\nSELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri"


def _triangles_per_vertex_sql() -> str:
    return (
        "WITH "
        + _TRIANGLE_CTES
        + """,
corners AS (
  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
counts AS (SELECT v, COUNT(*) AS c FROM corners GROUP BY v)
SELECT verts.v, CAST(COALESCE(counts.c, 0) AS BIGINT) AS n_triangles
FROM verts LEFT JOIN counts ON counts.v = verts.v"""
    )


def _degree_topk_sql(k: int = TOPK_K) -> str:
    return (
        "WITH "
        + _EDGES_CTES
        + f""",
outd AS (SELECT src AS v, COUNT(*) AS o FROM edges GROUP BY src),
ind AS (SELECT dst AS v, COUNT(*) AS i FROM edges GROUP BY dst),
d AS (
  SELECT verts.v,
         CAST(COALESCE(outd.o, 0) AS BIGINT) AS out_degree,
         CAST(COALESCE(ind.i, 0) AS BIGINT) AS in_degree
  FROM verts LEFT JOIN outd ON outd.v = verts.v LEFT JOIN ind ON ind.v = verts.v
)
SELECT v, out_degree, in_degree, out_degree + in_degree AS degree
FROM d ORDER BY degree DESC, v ASC LIMIT {k}"""
    )


def _edge_clean_sql() -> str:
    return "WITH " + _EDGES_CTES + "\nSELECT src, dst FROM edges"


def _degree_histogram_sql() -> str:
    # floor(log2(d)) via integer bit-width (LENGTH(BIN(d)) - 1): exact,
    # immune to libm log2 rounding on exact powers of two.
    return (
        "WITH "
        + _EDGES_CTES
        + """,
outd AS (SELECT src AS v, COUNT(*) AS o FROM edges GROUP BY src),
d AS (
  SELECT verts.v, COALESCE(outd.o, 0) AS o
  FROM verts LEFT JOIN outd ON outd.v = verts.v
)
SELECT CAST(CASE WHEN o = 0 THEN -1 ELSE LENGTH(BIN(o)) - 1 END AS INT) AS log2_degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM d GROUP BY 1"""
    )


def _bfs_sql() -> str:
    """Converged BFS depths + deterministic min-parent preds."""
    return (
        "WITH RECURSIVE "
        + _EDGES_CTES
        + ","
        + _WEDGES_CTE
        + f""",
walk(v, depth) AS (
  SELECT s, 0 FROM srcv
  UNION
  SELECT e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.depth < {BFS_DEPTH_CAP}
),
d AS (SELECT v, CAST(MIN(depth) AS BIGINT) AS depth FROM walk GROUP BY v),
p AS (
  SELECT e.dst AS v, MIN(e.src) AS pred
  FROM edges e JOIN d du ON du.v = e.src JOIN d dv ON dv.v = e.dst
  WHERE du.depth = dv.depth - 1 GROUP BY e.dst
)
SELECT d.v, d.depth, CASE WHEN d.depth = 0 THEN NULL ELSE p.pred END AS pred
FROM d LEFT JOIN p ON p.v = d.v"""
    )


def _sssp_sql(k: int = SSSP_ROUNDS) -> str:
    """k rounds of synchronous Bellman-Ford over the weighted derived
    edges (weights are a pure function of the endpoints — exact
    integer-valued doubles, no rounding needed)."""
    body = [
        "d0 AS (SELECT v, CASE WHEN v = (SELECT s FROM srcv) THEN 0.0 ELSE 1e18 END AS dist FROM verts)"
    ]
    for i in range(1, k + 1):
        body.append(
            f"""d{i} AS MATERIALIZED (
  SELECT d.v, LEAST(d.dist, COALESCE(m.nd, 1e18)) AS dist
  FROM d{i - 1} d LEFT JOIN (
    SELECT e.dst AS v, MIN(p.dist + e.w) AS nd
    FROM edges_w e JOIN d{i - 1} p ON p.v = e.src
    GROUP BY e.dst
  ) m ON m.v = d.v
)"""
        )
    return (
        "WITH "
        + _EDGES_CTES
        + ","
        + _WEDGES_CTE
        + ",\n"
        + ",\n".join(body)
        + f"\nSELECT v, dist FROM d{k} WHERE dist < 1e17"
    )


def _hits_sql(k: int = HITS_ITERS, delta: float = 0.85) -> str:
    """k iterations of this fork's HITS (zero init, AUTH then HUB,
    personalization seed at the min vertex)."""
    body = ["h0 AS (SELECT v, 0.0 AS hub FROM verts)"]
    for i in range(1, k + 1):
        body.append(
            f"""a{i} AS MATERIALIZED (
  SELECT verts.v, COALESCE(s.nauth, 0.0) AS auth
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM(h.hub / GREATEST(d.outd, 1.0)) AS nauth
    FROM edges e JOIN h{i - 1} h ON h.v = e.src JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) s ON s.v = verts.v
)"""
        )
        body.append(
            f"""h{i} AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN verts.v = (SELECT s FROM srcv)
                   AND COALESCE(dd.outd, 0.0) > 0 THEN {delta} ELSE 0.0 END
         + (1.0 - {delta}) * COALESCE(m.msg, 0.0) AS hub
  FROM verts
  LEFT JOIN deg dd ON dd.v = verts.v
  LEFT JOIN (
    SELECT e.src AS v, SUM(a.auth / i.ind) AS msg
    FROM edges e JOIN a{i} a ON a.v = e.dst JOIN indeg i ON i.v = e.dst
    GROUP BY e.src
  ) m ON m.v = verts.v
)"""
        )
    return (
        "WITH "
        + _EDGES_CTES
        + ","
        + _WEDGES_CTE
        + ",\n"
        + ",\n".join(body)
        + f"""
SELECT h.v, ROUND(h.hub, 9) AS hub, ROUND(a.auth, 9) AS auth
FROM h{k} h JOIN a{k} a ON a.v = h.v"""
    )


def _salsa_sql(k: int = SALSA_ITERS) -> str:
    """k iterations of reference SALSA (init 1/out_nodes, 1/in_nodes),
    factored into the same two linear passes as the engine."""
    body = [
        "onodes AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM deg)",
        "inodes AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM indeg)",
        "h0 AS (SELECT v, 1.0 / (SELECT c FROM onodes) AS hub FROM verts)",
        "a0 AS (SELECT v, 1.0 / (SELECT c FROM inodes) AS auth FROM verts)",
    ]
    for i in range(1, k + 1):
        body.append(
            f"""t{i} AS MATERIALIZED (
  SELECT e.dst AS v, SUM(h.hub / d.outd) AS t
  FROM edges e JOIN h{i - 1} h ON h.v = e.src JOIN deg d ON d.v = e.src
  GROUP BY e.dst
)"""
        )
        body.append(
            f"""h{i} AS MATERIALIZED (
  SELECT verts.v, COALESCE(m.nhub, 0.0) AS hub
  FROM verts LEFT JOIN (
    SELECT e.src AS v, SUM(t.t / i.ind) AS nhub
    FROM edges e JOIN t{i} t ON t.v = e.dst JOIN indeg i ON i.v = e.dst
    GROUP BY e.src
  ) m ON m.v = verts.v
)"""
        )
        body.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.src AS v, SUM(a.auth / i.ind) AS s
  FROM edges e JOIN a{i - 1} a ON a.v = e.dst JOIN indeg i ON i.v = e.dst
  GROUP BY e.src
)"""
        )
        body.append(
            f"""a{i} AS MATERIALIZED (
  SELECT verts.v, COALESCE(m.nauth, 0.0) AS auth
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM(s.s / d.outd) AS nauth
    FROM edges e JOIN s{i} s ON s.v = e.src JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) m ON m.v = verts.v
)"""
        )
    return (
        "WITH "
        + _EDGES_CTES
        + ","
        + _WEDGES_CTE
        + ",\n"
        + ",\n".join(body)
        + f"""
SELECT h.v, ROUND(h.hub, 9) AS hub, ROUND(a.auth, 9) AS auth
FROM h{k} h JOIN a{k} a ON a.v = h.v"""
    )


# ---------------------------------------------------------------------------
# Spark-side queries (engine API)
# ---------------------------------------------------------------------------


def _graph(spark: SparkSession, sf_dir: str):
    return derived_edge_table(spark, sf_dir)


def _q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = pagerank(_graph(spark, sf_dir), threshold=0.0, max_iter=PR_FIXED_ITERS)
    return res.state.select("v", F.round("rank", 6).alias("rank"))


def _q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-vertex-threshold convergence (reference stop rule) — fixpoint
    # iteration count is data-dependent, so this entry is rows-only.
    res = pagerank(_graph(spark, sf_dir), threshold=0.001, max_iter=100)
    return ranked(res.state)


def _q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(_graph(spark, sf_dir))
    return res.state.select("v", "label")


def _q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(_graph(spark, sf_dir))
    return component_sizes(res.state.select("v", "label"))


def _q_lp_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = label_propagation(_graph(spark, sf_dir), mode="mode", max_iter=LP_MODE_ITERS)
    return res.state.select("v", "label")


def _q_triangles_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count_df(_graph(spark, sf_dir))


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count_per_vertex(_graph(spark, sf_dir))


def _q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    return (
        g.degrees.select(
            "v",
            "out_degree",
            "in_degree",
            (F.col("out_degree") + F.col("in_degree")).alias("degree"),
        )
        .orderBy(F.desc("degree"), F.asc("v"))
        .limit(TOPK_K)
    )


def _q_edge_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).edges.select("src", "dst")


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph(spark, sf_dir).degree_histogram()


def _min_vertex(g) -> int:
    return int(g.vertices.agg(F.min("v")).collect()[0][0])


def _q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    res = bfs(g, source=_min_vertex(g), mark_predecessors=True)
    return res.state.select("v", "depth", "pred")


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = derived_edge_table(spark, sf_dir, weighted=True)
    res = sssp(g, source=_min_vertex(g))
    return res.state.where(F.col("dist") != float("inf")).select("v", "dist")


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    res = hits(g, src=_min_vertex(g), delta=0.85, max_iter=HITS_ITERS)
    return res.state.select(
        "v", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )


def _q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    res = salsa(g, max_iter=SALSA_ITERS)
    return res.state.select(
        "v", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )


def _q_wtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    return who_to_follow(g, src=_min_vertex(g), alpha=0.2)


def _q_bc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph(spark, sf_dir)
    return bc_single_source(g, source=_min_vertex(g))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank, ranked output, on sf0.001."""
    g = derived_edge_table(spark, "/root/testdata/sf0.001")
    res = pagerank(g, delta=0.85, threshold=0.001, max_iter=100)
    return ranked(res.state)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_fixed10": _q_pagerank_fixed,
        "pagerank_converged": _q_pagerank_converged,
        "cc_labels": _q_cc,
        "component_sizes": _q_component_sizes,
        "lp_mode3": _q_lp_mode,
        "triangles_total": _q_triangles_total,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "degree_topk": _q_degree_topk,
        "edge_clean": _q_edge_clean,
        "degree_histogram": _q_degree_histogram,
        "bfs_depths": _q_bfs,
        "sssp_dist": _q_sssp,
        "hits_k5": _q_hits,
        "salsa_k4": _q_salsa,
        "wtf_refscores": _q_wtf,
        "bc_single_source": _q_bc,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank_fixed10": _pagerank_fixed_sql(),
        # pagerank_converged: per-vertex-threshold stop is not
        # SQL-expressible without data-dependent iteration count →
        # rows-only check (documented in SURVEY.md §5).
        "cc_labels": _cc_sql(),
        "component_sizes": _component_sizes_sql(),
        "lp_mode3": _lp_mode_sql(),
        "triangles_total": _triangles_total_sql(),
        "triangles_per_vertex": _triangles_per_vertex_sql(),
        "degree_topk": _degree_topk_sql(),
        "edge_clean": _edge_clean_sql(),
        "degree_histogram": _degree_histogram_sql(),
        "bfs_depths": _bfs_sql(),
        "sssp_dist": _sssp_sql(),
        "hits_k5": _hits_sql(),
        "salsa_k4": _salsa_sql(),
        # wtf_refscores / bc_single_source: multi-phase, data-dependent
        # level structure — not SQL-expressible; rows-only here, exact
        # numpy-oracle parity in tests/test_linkrank.py & test_traversal.py.
    }
