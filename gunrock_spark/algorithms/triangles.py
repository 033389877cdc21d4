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


# auto-impl dispatch: the join path's work is the WEDGE SET size
# (O(Σ deg+²)), not |E| — a uniform 6M-edge graph has ~100x fewer
# wedges than a power-law graph of the same size and the wedge join
# beats the blocks path's applyInPandas + block-store-build overhead
# there (5.7x at sf1-big, BENCH.md §3a-r4b). Below MIN_EDGES the join
# is trivially cheap; above it the dispatcher estimates wedge work
# from the ALREADY-CACHED degree table (a |V|-row aggregate, no edge
# pass): est = Σ C(min(deg_out+deg_in, ceil(sqrt(2m))), 2) — an upper
# bound on oriented wedges, since orientation caps per-pivot fan-out
# at O(sqrt(m)) and the undirected degree is ≤ out+in. Overestimating
# is the safe direction: it prefers blocks on power-law inputs (the
# regime where the join measured 11.9x slower at 33M edges and
# disk-exhausted at 132M, §3a) and picks the join only when the wedge
# set is genuinely small. The blocks path — bounded-LRU slice cache,
# no residency ceiling since r3 — remains the scale path.
AUTO_BLOCKS_MIN_EDGES = 2_000_000
AUTO_BLOCKS_MIN_WEDGES = 1_000_000_000


def _estimated_wedges(graph: EdgeTable) -> int:
    """Upper bound on the oriented wedge count, from cached degrees."""
    m = graph.num_edges()
    cap = int((2 * m) ** 0.5) + 1
    d = F.least(F.col("out_degree") + F.col("in_degree"), F.lit(cap)).cast("double")
    row = graph.degrees.agg(F.sum(d * (d - 1) / 2.0).alias("w")).collect()[0]["w"]
    return int(row or 0)


def _auto_impl(graph: EdgeTable) -> str:
    if graph.num_edges() < AUTO_BLOCKS_MIN_EDGES:
        return "join"
    return "join" if _estimated_wedges(graph) < AUTO_BLOCKS_MIN_WEDGES else "blocks"


def triangle_count(graph: EdgeTable, impl: str = "auto") -> int:
    """Exact global triangle count (undirected semantics).

    ``impl`` selects the physical strategy:
      - "join": wedge join + closure join — pure Catalyst,
        shuffle-based. Its intermediate is the WEDGE SET
        (O(Σ deg+²) rows even after degree-ordered orientation) —
        measured 11.9x slower than blocks at 33M power-law edges and
        disk-exhausting at 132M (BENCH.md §3a); kept for tiny graphs
        and as the oracle-aligned cross-check.
      - "blocks": per-block-pair sorted-intersection pandas UDF over
        CSR slices (the north rule's optimized path; the DataFrame
        analog of the reference's per-edge adjacency intersection,
        gunrock/util/join.cuh:17-60 / Wang et al. HPGP'16) — never
        materializes wedges; per-worker memory bounded by the shared
        LRU slice cache (refetch on miss), so there is no upper edge
        limit. See :func:`triangle_count_blocks`.
      - "auto" (default): join below AUTO_BLOCKS_MIN_EDGES; above
        it, join only when the degree-table wedge estimate stays
        under AUTO_BLOCKS_MIN_WEDGES (uniform graphs), else blocks.
    """
    if impl == "auto":
        impl = _auto_impl(graph)
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
        impl = _auto_impl(graph)
    if impl == "blocks":
        spark = graph.edges.sparkSession
        return spark.createDataFrame(
            [(triangle_count_blocks(graph),)], schema="n_triangles long"
        )
    if impl != "join":
        raise ValueError(f"unknown impl {impl!r} (expected 'auto', 'join' or 'blocks')")
    return _closed_wedges(graph).agg(F.count(F.lit(1)).alias("n_triangles"))


def _adjacency_csr(store_path: str, block: int):
    """Decoded CSR triple for one block slice: (verts, indptr, dsts) —
    ``verts`` the sorted distinct srcs, ``dsts[indptr[i]:indptr[i+1]]``
    the SORTED UNIQUE out-neighbors of ``verts[i]``.

    Lookup order: (1) the in-process LRU
    (engine/csr_blocks._BLOCK_CACHE, kind "csr"); (2) the NODE-SHARED
    mmap cache (engine/csr_blocks.shared_csr_get) — one decoded copy
    per machine, shared by every worker process through the kernel
    page cache; (3) parquet decode, after which the slice is
    published node-wide (shared_csr_put). Without (2), 32 worker
    processes each decode each slice privately: measured at rmat22
    the pair stage spent 3x more core-time decoding than intersecting
    and 32 cores ran SLOWER than 8 (BENCH.md §3k-r5). Mmap entries
    enter the LRU at 0 bytes — their pages are shared and
    kernel-evictable, so they never displace private entries."""
    import numpy as np

    from gunrock_spark.engine.csr_blocks import (
        _BLOCK_CACHE,
        _read_block,
        shared_csr_get,
        shared_csr_put,
        store_ids_fit_int32,
    )

    key = (store_path, block, "csr")
    csr = _BLOCK_CACHE.get(key)
    if csr is not None:
        return csr
    _BLOCK_CACHE.evict_other_stores(store_path)
    csr = shared_csr_get(store_path, block)
    if csr is not None:
        _BLOCK_CACHE.put(key, csr, 0)
        return csr
    edf = _read_block(store_path, block)
    # graph-global id downcast (engine/csr_blocks.mark_store_int32):
    # halves slice bytes + kernel memory traffic when ids fit int32
    id_dtype = "int32" if store_ids_fit_int32(store_path) else "int64"
    src = edf["src"].to_numpy(dtype=id_dtype)
    dst = edf["dst"].to_numpy(dtype=id_dtype)
    if src.size == 0:
        empty = np.empty(0, dtype=id_dtype)
        csr = (empty, np.zeros(1, dtype="int64"), empty)
    else:
        order = np.lexsort((dst, src))
        src = src[order]
        dsts = np.ascontiguousarray(dst[order])
        bounds = np.flatnonzero(np.diff(src)) + 1
        firsts = np.concatenate(([0], bounds))
        verts = src[firsts]
        indptr = np.concatenate((firsts, [src.size]))
        csr = (verts, indptr, dsts)
    shared_csr_put(store_path, block, csr)
    _BLOCK_CACHE.put(key, csr, sum(int(a.nbytes) for a in csr))
    return csr


def triangle_count_blocks(
    graph: EdgeTable,
    num_blocks: int | None = None,
    salt_target: int | None = None,
) -> int:
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

    Scale contract: slices are fetched from shared storage and cached
    worker-locally in the byte-bounded LRU
    (engine/csr_blocks.LRUBytesCache, SPARK_GRAFT_BLOCK_CACHE_MB) —
    each block-pair task needs only ITS two slices resident, evicted
    slices are refetched, so per-worker memory is O(cache budget +
    2·|E|/P) regardless of graph size. Raise ``num_blocks`` so a
    slice (≈16 B/edge) fits the budget; the former 250 M-edge
    residency cap (VERDICT r2 #1) is gone."""
    import pandas as pd

    from gunrock_spark.engine.csr_blocks import remove_block_store

    o, store, cleanup, num_blocks = _oriented_block_store(graph, num_blocks)

    def pair_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-pivot intersection (VERDICT r2 #2): edges are
        # sorted by pivot u, each pivot's N+(u) gathered ONCE, and the
        # pivot's closing-edge candidates — the concatenation of every
        # partner w's N+(w) — membership-tested against N+(u) in one
        # searchsorted per pivot. Python dispatch is per DISTINCT
        # pivot, not per edge; everything inside is C-speed numpy.
        import numpy as np

        bu, bw = int(key[0]), int(key[1])
        verts_u, indptr_u, dsts_u = _adjacency_csr(store, bu)
        verts_w, indptr_w, dsts_w = _adjacency_csr(store, bw)
        total = 0
        if verts_u.size and verts_w.size and len(pdf):
            # probes adopt the slices' (possibly int32) dtype: the
            # downcast marker is graph-global, so every probe id fits,
            # and same-dtype searchsorted avoids a promoted copy
            u_arr = pdf["u"].to_numpy(dtype=verts_u.dtype)
            w_arr = pdf["w"].to_numpy(dtype=verts_w.dtype)
            order = np.argsort(u_arr, kind="stable")
            u_s, w_s = u_arr[order], w_arr[order]
            # locate every partner w's slice in the w-block CSR
            wi = np.minimum(np.searchsorted(verts_w, w_s), verts_w.size - 1)
            has_w = verts_w[wi] == w_s
            w_start = np.where(has_w, indptr_w[wi], 0)
            w_len = np.where(has_w, indptr_w[wi + 1] - indptr_w[wi], 0)
            # pivot group boundaries over the u-sorted edge rows
            grp = np.concatenate(
                ([0], np.flatnonzero(np.diff(u_s)) + 1, [u_s.size])
            )
            pivots = u_s[grp[:-1]]
            ui = np.minimum(np.searchsorted(verts_u, pivots), verts_u.size - 1)
            has_u = verts_u[ui] == pivots
            for g in range(pivots.size):
                if not has_u[g]:
                    continue
                a = dsts_u[indptr_u[ui[g]]:indptr_u[ui[g] + 1]]
                lo, hi = grp[g], grp[g + 1]
                lens = w_len[lo:hi]
                tot = int(lens.sum())
                if tot == 0 or a.size == 0:
                    continue
                # concatenated gather of the group's w-neighborhoods
                offs = np.repeat(w_start[lo:hi] - np.concatenate(
                    ([0], np.cumsum(lens)[:-1])
                ), lens)
                cand = dsts_w[np.arange(tot) + offs]
                cand = cand.astype(a.dtype, copy=False)  # no-op same-dtype
                pos = np.minimum(np.searchsorted(a, cand), a.size - 1)
                total += int(np.count_nonzero(a[pos] == cand))
        return pd.DataFrame({"cnt": pd.Series([total], dtype="int64")})

    tagged = o.select(
        "u",
        "w",
        F.pmod(F.hash("u"), F.lit(num_blocks)).alias("bu"),
        F.pmod(F.hash("w"), F.lit(num_blocks)).alias("bw"),
    )
    tagged, group_cols = _salt_heavy_pairs(
        tagged, graph.edges.sparkSession, store, num_blocks, target=salt_target
    )
    partials = tagged.groupBy(*group_cols).applyInPandas(
        pair_fn, schema="cnt long"
    )
    n = partials.agg(F.sum("cnt")).collect()[0][0] or 0
    remove_block_store(cleanup, store)
    return int(n)


def _salt_heavy_pairs(
    tagged,
    spark,
    store: str,
    num_blocks: int,
    max_salt: int = 64,
    target: int | None = None,
):
    """Split HEAVY (bu, bw) block-pair groups by pivot hash so one
    hub-dense pair cannot serialize the whole applyInPandas stage —
    the power-law reality of this algorithm family: with P blocks
    there are only P(P+1)/2 groups and the head pairs hold most of
    the wedge volume, so without salting the stage's wall-clock is
    the heaviest pair's run time no matter how many cores exist
    (measured flat 8->32 cores at rmat22 before this fix, BENCH.md
    §3k-r5). Salting is EXACT: the per-pivot intersection work is
    independent row-wise, and every row of one pivot u lands in the
    same salted subgroup (salt = hash(u) % salt_n), so each subgroup
    computes a disjoint subset of pivots against the same two cached
    slices. Cost: one pair census scanned off the ALREADY-WRITTEN
    block store parquet (src is the pivot; its partition column IS
    bu, so only hash(dst) is computed) — <= P^2 rows to the driver —
    plus a broadcast join tagging only the heavy pairs.

    ``target`` = desired max edges per task (default: total/(4*par),
    floored at 250k so tiny graphs never salt); salt_n(pair) =
    ceil(n/target), capped at ``max_salt``."""
    try:
        cnts = (
            spark.read.parquet(store)
            .groupBy(
                F.col("block").cast("int").alias("bu"),
                F.pmod(F.hash("dst"), F.lit(num_blocks)).alias("bw"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    except Exception:
        # an edge-free graph writes a part-less parquet dir whose
        # schema cannot be inferred — nothing to salt either way
        return tagged.withColumn("salt", F.lit(0)), ["bu", "bw", "salt"]
    total = sum(r["n"] for r in cnts)
    par = spark.sparkContext.defaultParallelism
    if target is None:
        target = max(total // (4 * par) + 1, 250_000)
    heavy = [
        (int(r["bu"]), int(r["bw"]),
         int(min(max_salt, -(-r["n"] // target))))
        for r in cnts
        if r["n"] > target
    ]
    if not heavy:
        return tagged.withColumn("salt", F.lit(0)), ["bu", "bw", "salt"]
    salt_df = spark.createDataFrame(
        heavy, schema="bu int, bw int, salt_n int"
    )
    out = (
        tagged.join(F.broadcast(salt_df), ["bu", "bw"], "left")
        .withColumn(
            "salt",
            F.when(F.col("salt_n").isNull(), F.lit(0)).otherwise(
                F.pmod(F.hash("u"), F.col("salt_n"))
            ),
        )
        .drop("salt_n")
    )
    return out, ["bu", "bw", "salt"]


def _oriented_block_store(graph: EdgeTable, num_blocks: int | None):
    """Shared setup for the blocks TC strategies: degree-ordered
    oriented edges written once to a CSR block store. Returns
    (oriented_df, store_path, cleanup_path, num_blocks)."""
    import os
    import tempfile
    import uuid

    from gunrock_spark.engine.csr_blocks import (
        LRUBytesCache,
        build_block_store,
    )

    spark = graph.edges.sparkSession
    if num_blocks is None:
        # Scale-aware block count (Suri & Vassilvitskii's partitioned
        # TC sizing): a slice must fit comfortably inside the worker
        # LRU budget or every pair task thrashes the cache. A slice
        # holds ~|E+|/P edges at ~16 B decoded (two int64 columns),
        # so pick the smallest P with slice ≤ budget/4 (leaves room
        # for two resident slices per task plus frame/csr duplicates),
        # floored at the cluster parallelism. Read amplification of
        # the block store is O(P) — the standard trade of this
        # algorithm family — so P should not be raised gratuitously.
        budget = LRUBytesCache.budget_bytes()
        # |E+| = undirected edge count ≤ num_edges(); use the upper
        # bound (over-partitioning is cheap, an oversized slice isn't)
        oriented_edges = graph.num_edges()
        par = spark.sparkContext.defaultParallelism
        fit = -(-oriented_edges * 16 // max(budget // 4, 1))  # ceil
        num_blocks = max(par, int(fit))
    o = _oriented(graph)
    base = os.environ.get("SPARK_GRAFT_BLOCK_STORE")
    tmp_base = tempfile.mkdtemp(prefix="tc_blocks_") if base is None else None
    store = (base or tmp_base).rstrip("/") + "/" + uuid.uuid4().hex
    build_block_store(
        o.select(F.col("u").alias("src"), F.col("w").alias("dst")), num_blocks, store
    )
    # Graph-global int32 decision off the already-cached |V|-row degree
    # table (one tiny agg job, dwarfed by the store write): when every
    # id fits int32, the decoded slices AND the probe arrays downcast,
    # halving the intersection kernels' memory traffic and the shm
    # cache footprint. Absent at true web scale (ids >= 2^31) — the
    # kernels then run int64 exactly as before.
    from gunrock_spark.engine.csr_blocks import mark_store_int32

    rng = graph.degrees.agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    ).collect()[0]
    if (
        rng["mx"] is not None
        and rng["mn"] >= -(2**31)
        and rng["mx"] < 2**31
    ):
        mark_store_int32(store)
    return o, store, (tmp_base or store), num_blocks


def triangle_count_per_vertex_blocks(
    graph: EdgeTable,
    num_blocks: int | None = None,
    salt_target: int | None = None,
) -> DataFrame:
    """DataFrame[v, n_triangles] via the blocks strategy — the scale
    path for per-vertex counts (the wedge-join variant materializes
    the full triangle list, which explodes on power-law graphs exactly
    like the join total count, BENCH.md §3a).

    Same block-pair plan as :func:`triangle_count_blocks`; instead of
    one partial count, each task credits the three corners of every
    matched triangle (pivot u, partner w, closing vertex c) and emits
    per-vertex partial counts — output per task is bounded by the
    distinct vertices its two slices touch, never by the triangle
    count. A final groupBy(v) merges partials; vertices in no
    triangle come back 0 via the vertex-table left join."""
    import numpy as np
    import pandas as pd

    from gunrock_spark.engine.csr_blocks import remove_block_store

    o, store, cleanup, num_blocks = _oriented_block_store(graph, num_blocks)

    def pair_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bu, bw = int(key[0]), int(key[1])
        verts_u, indptr_u, dsts_u = _adjacency_csr(store, bu)
        verts_w, indptr_w, dsts_w = _adjacency_csr(store, bw)
        corners: list = []
        if verts_u.size and verts_w.size and len(pdf):
            # same probe-dtype adoption as the total-count kernel;
            # corner concatenation below promotes back to int64
            u_arr = pdf["u"].to_numpy(dtype=verts_u.dtype)
            w_arr = pdf["w"].to_numpy(dtype=verts_w.dtype)
            order = np.argsort(u_arr, kind="stable")
            u_s, w_s = u_arr[order], w_arr[order]
            wi = np.minimum(np.searchsorted(verts_w, w_s), verts_w.size - 1)
            has_w = verts_w[wi] == w_s
            w_start = np.where(has_w, indptr_w[wi], 0)
            w_len = np.where(has_w, indptr_w[wi + 1] - indptr_w[wi], 0)
            grp = np.concatenate(
                ([0], np.flatnonzero(np.diff(u_s)) + 1, [u_s.size])
            )
            pivots = u_s[grp[:-1]]
            ui = np.minimum(np.searchsorted(verts_u, pivots), verts_u.size - 1)
            has_u = verts_u[ui] == pivots
            for g in range(pivots.size):
                if not has_u[g]:
                    continue
                a = dsts_u[indptr_u[ui[g]]:indptr_u[ui[g] + 1]]
                lo, hi = grp[g], grp[g + 1]
                lens = w_len[lo:hi]
                tot = int(lens.sum())
                if tot == 0 or a.size == 0:
                    continue
                offs = np.repeat(w_start[lo:hi] - np.concatenate(
                    ([0], np.cumsum(lens)[:-1])
                ), lens)
                cand = dsts_w[np.arange(tot) + offs]
                cand = cand.astype(a.dtype, copy=False)  # no-op same-dtype
                pos = np.minimum(np.searchsorted(a, cand), a.size - 1)
                match = a[pos] == cand
                n = int(np.count_nonzero(match))
                if n == 0:
                    continue
                # the three corners of each matched triangle
                corners.append(np.full(n, pivots[g], dtype="int64"))
                corners.append(np.repeat(w_s[lo:hi], lens)[match])
                corners.append(cand[match])
        if not corners:
            return pd.DataFrame(
                {"v": pd.Series(dtype="int64"), "cnt": pd.Series(dtype="int64")}
            )
        vs, cnts = np.unique(np.concatenate(corners), return_counts=True)
        return pd.DataFrame({"v": vs, "cnt": cnts.astype("int64")})

    tagged = o.select(
        "u",
        "w",
        F.pmod(F.hash("u"), F.lit(num_blocks)).alias("bu"),
        F.pmod(F.hash("w"), F.lit(num_blocks)).alias("bw"),
    )
    tagged, group_cols = _salt_heavy_pairs(
        tagged, graph.edges.sparkSession, store, num_blocks, target=salt_target
    )
    partials = tagged.groupBy(*group_cols).applyInPandas(
        pair_fn, schema="v long, cnt long"
    )
    counts = partials.groupBy("v").agg(F.sum("cnt").alias("n_triangles"))
    out = graph.vertices.join(counts, "v", "left").select(
        "v", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )
    # the block store must outlive the returned (lazy) plan: hand
    # cleanup to the caller via an action barrier — materialize here
    # so the store can be removed before returning.
    out = out.localCheckpoint(eager=True)
    remove_block_store(cleanup, store)
    return out


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


def doulion_keep(a, b, num: int, den: int, seed: int = 42):
    """Retention predicate Column for DOULION edge sparsification:
    keep the canonical undirected pair (a <= b) iff
    ``sample_hash(combine(a, b)) % den < num`` — the pipeline's
    arithmetic sampling-hash contract (pipeline/sampling.py), so the
    kept edge set is bit-stable across runs, engines, repartitioning
    and cluster sizes, and exactly replayable in ANSI SQL."""
    from gunrock_spark.pipeline.sampling import HASH_A, HASH_P, sample_hash

    pair_key = F.pmod(
        F.pmod(a.cast("long"), F.lit(HASH_P)) * HASH_A
        + F.pmod(b.cast("long"), F.lit(HASH_P)),
        F.lit(HASH_P),
    )
    return F.pmod(sample_hash(pair_key, seed), F.lit(den)) < num


def triangle_count_doulion(
    graph: EdgeTable,
    num: int = 1,
    den: int = 3,
    seed: int = 42,
    impl: str = "auto",
) -> DataFrame:
    """DOULION sparsified triangle estimate (Tsourakakis, Kang, Miller
    & Faloutsos, KDD 2009 "DOULION: counting triangles in massive
    graphs with a coin"): keep each undirected edge with probability
    p = num/den, count triangles EXACTLY on the sparsified graph, and
    scale the count by 1/p^3 — an unbiased estimator whose error
    concentrates for p above ~1/sqrt(mean degree). The reference's
    sampled-TC analog is its `sample` primitive family
    (gunrock/app/sample/sample_app.cu) composed with tc.

    Deterministic twist: the coin is the arithmetic sampling hash of
    the canonical pair (:func:`doulion_keep`), not ``rand()`` — the
    same estimate on every run, every engine, any cluster size, and
    replayable by the ANSI-SQL oracle.

    The 100 TB story: the full count at p=1/10 runs on a graph with
    ~|E|/10 edges — the orient/store-build pass (the disk-bound phase,
    BENCH.md §3k-r5) shrinks 10x, the pair stage ~p^1.5-superlinearly
    (both slice sizes AND edges-per-pair-task shrink) — while the
    relative error on a power-law web graph stays sub-percent because
    triangle-rich hub neighborhoods keep thousands of sampled wedge
    closures. Sparsification is a pushed-down scan filter: zero extra
    shuffle before the standard TC plan.

    Returns a 1-row DataFrame[sampled_triangles long,
    est_triangles double] (estimate rounded to 6 dp)."""
    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")
    keep = doulion_keep(F.least("src", "dst"), F.greatest("src", "dst"), num, den, seed)
    sampled = EdgeTable.from_df(
        graph.edges.where(keep),
        # graph.edges is already cleaned (deduped, self-loop-free):
        # skip the re-clean shuffle, keep only the sampling filter
        drop_self_loops=False,
        dedup=False,
    )
    scale = float(den) ** 3 / float(num) ** 3
    out = triangle_count_df(sampled, impl=impl).select(
        F.col("n_triangles").alias("sampled_triangles"),
        F.round(F.col("n_triangles") * F.lit(scale), 6).alias("est_triangles"),
    )
    sampled.unpersist()
    return out
