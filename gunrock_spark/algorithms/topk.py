"""TopK degree centrality.

Re-creates the reference's TopK (gunrock/app/topk/): total degree =
in + out (topk_enactor.cuh:133-141), sort desc (CUB radix sort,
:153), return the top ``k`` (``top_nodes``). Ties broken by vertex id
asc for determinism (the reference's radix sort is stable on the
original index order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def degree_topk(graph: EdgeTable, k: int = 10) -> DataFrame:
    """DataFrame[v, out_degree, in_degree, degree] — top-k by total
    degree desc, v asc."""
    return (
        graph.degrees.select(
            "v",
            "out_degree",
            "in_degree",
            (F.col("out_degree") + F.col("in_degree")).alias("degree"),
        )
        .orderBy(F.desc("degree"), F.asc("v"))
        .limit(k)
    )
