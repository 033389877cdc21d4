"""Triangle counting — degree-ordered orientation + wedge-closure join.

The reference names TC as a Gunrock capability (README.md:180-182,
Wang et al. HPGP'16 — intersect adjacency lists per edge; helper
kernels in gunrock/util/join.cuh) but ships no app in this fork; the
north rule requires exact triangle counts.

Algorithm (the O(m^1.5)-work standard): treat the graph as undirected
(canonical edge (a,b) with a<b after cleaning), then orient every edge
from the lower-ranked to the higher-ranked endpoint where rank =
(degree, vertex id) lexicographic. Every triangle has exactly one
wedge at its lowest-ranked vertex, so

    wedges  = oriented e1 ⋈ oriented e2 on pivot u  (w1 < w2 by rank)
    closed  = wedges ⋈ oriented on (w1, w2)
    count   = count(closed)          -- never materialize wedge lists

The orientation bounds each pivot's fan-out by O(sqrt(m)), which is
what keeps the wedge join from exploding on power-law graphs — the
DataFrame analog of the reference's per-edge sorted intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable


def _oriented(graph: EdgeTable) -> DataFrame:
    """Undirected canonical edges oriented low-rank -> high-rank,
    rank = (undirected degree, v). Returns DataFrame[u, w]."""
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )


def _closed_wedges(graph: EdgeTable) -> DataFrame:
    """DataFrame[u, w1, w2] — one row per triangle (u = lowest-ranked)."""
    o = _oriented(graph).persist()
    e1 = o.select(F.col("u").alias("u"), F.col("w").alias("w1"))
    e2 = o.select(F.col("u").alias("u"), F.col("w").alias("w2"))
    # each unordered pair {w1, w2} once: w1 < w2 by vertex id is enough
    # (both orientations of the closing edge are checked below)
    wedges = e1.join(e2, "u").where(F.col("w1") < F.col("w2"))
    closing = o.select(
        F.least("u", "w").alias("w1"), F.greatest("u", "w").alias("w2")
    )
    return wedges.join(closing, ["w1", "w2"]).select("u", "w1", "w2")


# auto-impl thresholds: below MIN the wedge join's overhead is
# trivial anyway; above MAX the oriented CSR (~16 B/edge + numpy/dict
# overhead) stops fitting comfortably in one executor's memory and
# the shuffle-based join is the only strategy that spills.
AUTO_BLOCKS_MIN_EDGES = 2_000_000
AUTO_BLOCKS_MAX_EDGES = 250_000_000


def triangle_count(graph: EdgeTable, impl: str = "auto") -> int:
    """Exact global triangle count (undirected semantics).

    ``impl`` selects the physical strategy:
      - "join": wedge join + closure join — pure Catalyst,
        shuffle-based. Its intermediate is the WEDGE SET
        (O(Σ deg+²) rows even after degree-ordered orientation) —
        measured 11.9x slower than blocks at 33M power-law edges and
        disk-exhausting at 132M (BENCH.md §3a); it is, however, the
        only strategy whose memory is bounded by a shuffle partition,
        so it remains the fallback beyond per-executor CSR capacity.
      - "blocks": per-partition sorted-intersection pandas UDF over
        CSR block pairs (the north rule's optimized path; the
        DataFrame analog of the reference's per-edge adjacency
        intersection, gunrock/util/join.cuh:17-60 / Wang et al.
        HPGP'16) — never materializes wedges; wants the oriented CSR
        resident per executor (GPU-style). See
        :func:`triangle_count_blocks`.
      - "auto" (default): blocks while |E| is inside
        [AUTO_BLOCKS_MIN_EDGES, AUTO_BLOCKS_MAX_EDGES], join
        otherwise.
    """
    if impl == "auto":
        m = graph.num_edges()
        impl = (
            "blocks"
            if AUTO_BLOCKS_MIN_EDGES <= m <= AUTO_BLOCKS_MAX_EDGES
            else "join"
        )
    if impl == "blocks":
        return triangle_count_blocks(graph)
    if impl != "join":
        raise ValueError(f"unknown impl {impl!r} (expected 'auto', 'join' or 'blocks')")
    return _closed_wedges(graph).count()


def triangle_count_df(graph: EdgeTable, impl: str = "auto") -> DataFrame:
    """Global count as a 1-row DataFrame[n_triangles long] (for the
    correctness harness). Same ``impl`` semantics as
    :func:`triangle_count`."""
    if impl == "auto":
        m = graph.num_edges()
        impl = (
            "blocks"
            if AUTO_BLOCKS_MIN_EDGES <= m <= AUTO_BLOCKS_MAX_EDGES
            else "join"
        )
    if impl == "blocks":
        spark = graph.edges.sparkSession
        return spark.createDataFrame(
            [(triangle_count_blocks(graph),)], schema="n_triangles long"
        )
    if impl != "join":
        raise ValueError(f"unknown impl {impl!r} (expected 'auto', 'join' or 'blocks')")
    return _closed_wedges(graph).agg(F.count(F.lit(1)).alias("n_triangles"))


# worker-local decoded adjacency cache: (store_path, block) ->
# dict[vertex -> sorted unique numpy array of out-neighbors]. Same
# immutability contract as csr_blocks._BLOCK_CACHE (unique store path
# per build); evicted alongside it on store change.
_ADJ_CACHE: dict = {}


def _adjacency(store_path: str, block: int):
    key = (store_path, block)
    adj = _ADJ_CACHE.get(key)
    if adj is None:
        from gunrock_spark.engine.csr_blocks import _load_block

        for k in [k for k in _ADJ_CACHE if k[0] != store_path]:
            del _ADJ_CACHE[k]
        edf = _load_block(store_path, block).sort_values(["src", "dst"])
        adj = {
            int(u): grp["dst"].to_numpy()
            for u, grp in edf.groupby("src", sort=False)
        }
        _ADJ_CACHE[key] = adj
    return adj


def triangle_count_blocks(graph: EdgeTable, num_blocks: int | None = None) -> int:
    """Exact triangle count via per-partition sorted intersection of
    CSR adjacency slices (SURVEY §7.2 item 8; reference per-edge
    intersection, util/join.cuh:17-60).

    Physical plan: the degree-ordered oriented edges are written once
    to a CSR block store (block = pmod(hash(u), P), sorted by u —
    engine/csr_blocks.py infrastructure). Each oriented edge (u, w)
    contributes |N+(u) ∩ N+(w)| triangles; edges are grouped by the
    BLOCK PAIR (block(u), block(w)) via ``applyInPandas``, so every
    task touches exactly two CSR slices, intersected with vectorized
    numpy over worker-cached decoded adjacency (no per-row Python
    against Spark rows; only partial counts cross Arrow back).

    Scale contract: like the reference's GPU kernels this strategy
    wants the oriented CSR resident per executor (slices are fetched
    from shared storage and cached worker-locally; a worker may
    eventually hold all P slices ≈ m/2 edges). That is the
    compute-optimized regime; beyond per-executor memory, use the
    shuffle-based join path (the default)."""
    import os
    import tempfile
    import uuid

    import pandas as pd

    from gunrock_spark.engine.csr_blocks import (
        build_block_store,
        remove_block_store,
    )

    spark = graph.edges.sparkSession
    if num_blocks is None:
        num_blocks = spark.sparkContext.defaultParallelism
    o = _oriented(graph)
    base = os.environ.get("SPARK_GRAFT_BLOCK_STORE")
    tmp_base = tempfile.mkdtemp(prefix="tc_blocks_") if base is None else None
    store = (base or tmp_base).rstrip("/") + "/" + uuid.uuid4().hex
    build_block_store(
        o.select(F.col("u").alias("src"), F.col("w").alias("dst")), num_blocks, store
    )

    def pair_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bu, bw = int(key[0]), int(key[1])
        adj_u = _adjacency(store, bu)
        adj_w = _adjacency(store, bw)
        total = 0
        for u, w in zip(pdf["u"].to_numpy(), pdf["w"].to_numpy()):
            a = adj_u.get(int(u))
            b = adj_w.get(int(w))
            if a is not None and b is not None:
                total += np.intersect1d(a, b, assume_unique=True).size
        return pd.DataFrame({"cnt": pd.Series([total], dtype="int64")})

    tagged = o.select(
        "u",
        "w",
        F.pmod(F.hash("u"), F.lit(num_blocks)).alias("bu"),
        F.pmod(F.hash("w"), F.lit(num_blocks)).alias("bw"),
    )
    partials = tagged.groupBy("bu", "bw").applyInPandas(pair_fn, schema="cnt long")
    n = partials.agg(F.sum("cnt")).collect()[0][0] or 0
    remove_block_store(tmp_base or store)
    return int(n)


def triangle_count_per_vertex(graph: EdgeTable) -> DataFrame:
    """DataFrame[v, n_triangles] — triangles incident to each vertex
    (every triangle credits all three corners); vertices in no triangle
    are included with 0."""
    tri = _closed_wedges(graph)
    corners = (
        tri.select(F.col("u").alias("v"))
        .unionByName(tri.select(F.col("w1").alias("v")))
        .unionByName(tri.select(F.col("w2").alias("v")))
    )
    counts = corners.groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    return graph.vertices.join(counts, "v", "left").select(
        "v", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )
