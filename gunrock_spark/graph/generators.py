"""Deterministic graph + pages generators (seeded; no wall clock).

Mirrors the reference's graphio generators (SURVEY.md §1.6):
- R-MAT with the reference defaults a=0.55 b=0.2 c=0.2 d=0.05
  (gunrock/graphio/rmat.cuh:180-184), vectorized in numpy.
- The tiny golden graphs from the reference's dataset/small/ and
  python/toy_graph, re-encoded 0-based (FIXTURES.md §4).
- A Common-Crawl-style ``pages`` table matching the north-rule input
  shape (url, warc_ts, html, text, lang), whose embedded <a href> links
  realize a seeded R-MAT edge set — so ingestion tests can assert the
  recovered edge set exactly.
"""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# R-MAT (reference defaults: gunrock/graphio/rmat.cuh:180-184)
# ---------------------------------------------------------------------------


def rmat_edges(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.55,
    b: float = 0.2,
    c: float = 0.2,
    d: float = 0.05,
    seed: int = 42,
) -> np.ndarray:
    """Seeded R-MAT edge list, shape (m, 2) int64. Raw output — may
    contain self-loops and duplicates (the cleaning contract is under
    test downstream, like the reference's FromCoo pass)."""
    n = 1 << scale
    m = n * edge_factor
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for level in range(scale):
        r = rng.random(m)
        # quadrant probabilities a, b, c, d
        go_right = (r >= a) & (r < a + b) | (r >= a + b + c)  # col bit
        go_down = r >= a + b  # row bit
        src |= go_down.astype(np.int64) << level
        dst |= go_right.astype(np.int64) << level
    return np.stack([src, dst], axis=1)


def rmat_edges_df(spark: SparkSession, scale: int, edge_factor: int = 16, seed: int = 42, **kw) -> DataFrame:
    """R-MAT edges as a Spark DataFrame.

    For test scales (<= 2^20 edges) numpy-on-driver is fine; the
    at-scale path would use ``spark.range(m).mapInPandas`` with a
    per-partition seeded rng — see rmat_edges_df_distributed.
    """
    arr = rmat_edges(scale, edge_factor, seed=seed, **kw)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))


def rmat_edges_df_distributed(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed R-MAT: each partition generates its slice of edges
    with an independently-seeded rng — the shape of the generator job a
    1000-executor cluster would run (no driver materialization)."""
    n = 1 << scale
    m = n * edge_factor
    parts = num_partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            for _, row in pdf.iterrows():
                pid = int(row["id"])
                lo = m * pid // parts
                hi = m * (pid + 1) // parts
                cnt = hi - lo
                if cnt <= 0:
                    continue
                rng = np.random.default_rng(seed + 1_000_003 * pid)
                src = np.zeros(cnt, dtype=np.int64)
                dst = np.zeros(cnt, dtype=np.int64)
                for level in range(scale):
                    r = rng.random(cnt)
                    go_right = (r >= 0.55) & (r < 0.75) | (r >= 0.95)
                    go_down = r >= 0.75
                    src |= go_down.astype(np.int64) << level
                    dst |= go_right.astype(np.int64) << level
                yield pd.DataFrame({"src": src, "dst": dst})

    return (
        spark.range(parts).repartition(parts, "id")
        .mapInPandas(gen, schema="src long, dst long")
    )


def planted_partition_edges_df(
    spark: SparkSession,
    num_vertices: int,
    num_communities: int,
    deg_in: int = 8,
    deg_out: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Deterministic planted-partition (stochastic-block-model-like)
    graph, pure DataFrame ops — the ground-truth-community input for
    partitioner evaluation (the same role the reference's cluster
    partitioner tests play, app/cp/cp_partitioner.cuh).

    Vertex v belongs to community ``v // ceil(n/C)`` (contiguous id
    blocks). Each vertex emits ``deg_in`` intra-community edges and
    ``deg_out`` uniform edges, destinations chosen by xxhash64 — fully
    deterministic, no driver materialization, no Python rows; scales
    to any n as a single projection job.
    """
    n, c = num_vertices, num_communities
    size = -(-n // c)  # ceil
    v = F.col("id").alias("v")
    base = (F.col("id") / size).cast("long") * size
    blk = F.least(F.lit(size), F.lit(n) - base)  # last block may be short
    intra = F.transform(
        F.sequence(F.lit(0), F.lit(deg_in - 1)),
        lambda i: base + F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), blk),
    )
    inter = F.transform(
        F.sequence(F.lit(0), F.lit(deg_out - 1)),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed + 1)), F.lit(n)),
    )
    return (
        spark.range(n)
        .select(v, F.explode(F.concat(intra, inter)).alias("dst"))
        .select(F.col("v").alias("src"), "dst")
        .where(F.col("src") != F.col("dst"))
    )


# ---------------------------------------------------------------------------
# Golden graphs (FIXTURES.md §4; re-encoded from the reference's
# dataset/small/*.mtx and python/toy_graph, 0-based)
# ---------------------------------------------------------------------------

# dataset/small/test_pr.mtx — 4 vertices, 8 directed edges
G_PR4 = [(1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (0, 2), (0, 3), (2, 3)]

# dataset/small/test_cc.mtx — 11 vertices, 20 directed edges, 2 components
G_CC11 = [
    (1, 0), (2, 0), (3, 0), (0, 1), (4, 1), (2, 1), (3, 2), (4, 2), (5, 2),
    (5, 3), (6, 3), (2, 4), (5, 4), (6, 4), (6, 5), (8, 7), (9, 7), (10, 7),
    (9, 8), (10, 8),
]

# python/toy_graph/{row,col}.txt — 7 vertices, 26 directed edges (symmetric)
_TOY7_ROW_OFFSETS = [0, 3, 6, 11, 15, 19, 23, 26]
_TOY7_COL = [1, 2, 3, 0, 2, 4, 0, 1, 3, 4, 5, 0, 2, 5, 6, 1, 2, 5, 6, 2, 3, 4, 6, 3, 4, 5]
G_TOY7 = [
    (v, _TOY7_COL[e])
    for v in range(7)
    for e in range(_TOY7_ROW_OFFSETS[v], _TOY7_ROW_OFFSETS[v + 1])
]


def edges_df(spark: SparkSession, edges: list[tuple[int, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], schema="src long, dst long"
    )


# ---------------------------------------------------------------------------
# Common-Crawl-style pages table (north-rule input shape; FIXTURES.md §1)
# ---------------------------------------------------------------------------

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)


def url_for(vertex: int) -> str:
    site, page = divmod(vertex, 1000)
    return f"https://site{site:05d}.example/page/{page:06d}"


def _page_html_text(vertex: int, out_links: list[int], seed: int = 42) -> tuple[bytes, str]:
    """Deterministic html + its canonical extracted text for one page.

    The extractor contract (byte-identical text per url, north rule):
    text = title, then each anchor text, then the paragraph, joined by
    newline. The html embeds out-links as <a href> to the target urls.
    """
    rng = np.random.default_rng(seed + vertex)
    words = " ".join(_LOREM[i] for i in rng.integers(0, len(_LOREM), 12))
    title = f"T{vertex}"
    anchors = [(url_for(t), f"anchor {k}") for k, t in enumerate(out_links)]
    html = (
        f"<html><head><title>{title}</title></head><body>"
        + "".join(f'<a href="{u}">{a}</a>' for u, a in anchors)
        + f"<p>{words}</p></body></html>"
    )
    text = "\n".join([title] + [a for _, a in anchors] + [words])
    return html.encode("utf-8"), text


def pages_table(
    spark: SparkSession, n_pages: int = 64, edge_factor: int = 4, seed: int = 42
) -> tuple[DataFrame, list[tuple[int, int]]]:
    """Deterministic pages table whose links realize a seeded R-MAT
    graph over n_pages vertices (n_pages must be a power of two).
    Returns (pages_df, true_edge_list) — the true edges are the raw
    R-MAT output restricted to distinct non-self links per page, in the
    order they appear in the html."""
    scale = int(np.log2(n_pages))
    assert (1 << scale) == n_pages, "n_pages must be a power of two"
    raw = rmat_edges(scale, edge_factor, seed=seed)
    outs: dict[int, list[int]] = {}
    true_edges: list[tuple[int, int]] = []
    for s, d in raw:
        s, d = int(s), int(d)
        if s == d:
            continue
        lst = outs.setdefault(s, [])
        if d not in lst:
            lst.append(d)
            true_edges.append((s, d))
    rows = []
    for v in range(n_pages):
        html, text = _page_html_text(v, outs.get(v, []), seed=seed)
        rows.append(
            (
                url_for(v),
                _EPOCH + datetime.timedelta(seconds=v),
                bytearray(html),
                text,
                "de" if v % 13 == 12 else "en",
            )
        )
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return df, true_edges


# ---------------------------------------------------------------------------
# Random geometric graph (reference: gunrock/graphio/rgg.cuh — default
# threshold 0.55*sqrt(log n / n), rgg.cuh:123-126) and Watts-Strogatz
# small world (gunrock/graphio/small_world.cuh:28-46, boost generator
# with ring degree k and rewire probability p). Seeded numpy versions.
# ---------------------------------------------------------------------------


def rgg_edges(
    n: int, threshold: float | None = None, seed: int = 42
) -> np.ndarray:
    """Random geometric graph on the unit square: an (undirected →
    both directions) edge for every point pair within ``threshold``.
    O(n) expected work via the reference's grid-bucket trick
    (rgg.cuh:126,175-176), vectorized per bucket-pair."""
    if threshold is None:
        threshold = 0.55 * np.sqrt(np.log(n) / n)
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2))
    cell = np.floor(pts / threshold).astype(np.int64)
    ncells = int(1.0 / threshold) + 2
    cell_id = cell[:, 0] * ncells + cell[:, 1]
    order = np.argsort(cell_id, kind="stable")
    edges: list[tuple[int, int]] = []
    # bucket index: vertex lists per cell
    from collections import defaultdict

    buckets: dict[int, list[int]] = defaultdict(list)
    for idx in order:
        buckets[int(cell_id[idx])].append(int(idx))
    thr2 = threshold * threshold
    for cid, members in buckets.items():
        cx, cy = divmod(cid, ncells)
        cand: list[int] = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cand.extend(buckets.get((cx + dx) * ncells + (cy + dy), ()))
        if not cand:
            continue
        cand_arr = np.array(cand)
        for u in members:
            d = pts[cand_arr] - pts[u]
            close = cand_arr[(d * d).sum(axis=1) <= thr2]
            for v in close:
                if v > u:
                    edges.append((u, int(v)))
                    edges.append((int(v), u))
    return np.array(sorted(set(edges)), dtype=np.int64).reshape(-1, 2)


def small_world_edges(
    n: int, k: int = 4, p: float = 0.05, seed: int = 42
) -> np.ndarray:
    """Watts-Strogatz: ring lattice (each vertex → k nearest on each
    side / 2 per the boost convention: k total neighbors clockwise),
    each edge rewired to a random target with probability ``p``.
    Undirected (both directions emitted)."""
    rng = np.random.default_rng(seed)
    edges = set()
    half = max(k // 2, 1)
    for u in range(n):
        for j in range(1, half + 1):
            v = (u + j) % n
            if rng.random() < p:
                v = int(rng.integers(0, n))
                while v == u:
                    v = int(rng.integers(0, n))
            if u != v:
                edges.add((u, v))
                edges.add((v, u))
    return np.array(sorted(edges), dtype=np.int64).reshape(-1, 2)
