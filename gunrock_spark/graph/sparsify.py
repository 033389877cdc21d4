"""Degree-proportional edge sparsification — the pre-pass that makes
quadratic-ish motif/similarity analytics affordable on a power-law web
graph: sample each edge with probability ~ min(1, c / sqrt(d_u * d_v)),
the standard effective-resistance *surrogate* (Spielman-Srivastava's
R_e is upper-bounded by (1/d_u + 1/d_v); the degree-product rule is
its cheap, public approximation used by triangle/motif samplers such
as Tsourakakis et al.'s DOULION family). Hub-hub edges — the ones that
blow up wedge joins — are kept with the lowest probability, while the
sparse periphery survives intact.

Determinism contract (the rand()-vs-hash argument of
pipeline/sampling.py): the keep decision is

    keep(u, v)  iff  h(u, v) * isqrt(d_u * d_v) < c * P

with ``h`` the shared affine hash in [0, P) and
``isqrt = floor(sqrt(double(d_u * d_v)))`` — IEEE sqrt is correctly
rounded and d_u*d_v < 2^53 converts exactly, so the integer comparison
replays bit-identically on any engine, retry, or cluster size. The
keep probability is ~ c / isqrt (capped at 1 when isqrt <= c).

Scale shape: two broadcast-or-shuffle joins against the cached |V|
degree table + one scan-bound filter; no Python, no sampling state,
no global sort. The output is a plain edge DataFrame that feeds
EdgeTable.from_df unchanged.

Reference analog: none (the reference computes on the full graph);
this is corpus-scale tooling in the spirit of its per-edge
load-balancing concerns (gunrock/oprtr/edge_map_forward/cta.cuh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.graph.edge_table import EdgeTable

HASH_P = 900_000_007
HASH_A = 1_000_003
HASH_B = 104_729


def sparsify_edges(graph: EdgeTable, c: int = 4, seed: int = 42) -> DataFrame:
    """DataFrame[src, dst] — the deterministically sampled edge subset
    with per-edge keep probability ~ min(1, c / sqrt(d_src * d_dst))
    over TOTAL degrees (in + out). ``c`` trades density for fidelity:
    every edge with d_src * d_dst <= c^2 is always kept."""
    if c < 1:
        raise ValueError("c must be >= 1")
    deg = graph.degrees.select(
        "v", (F.col("out_degree") + F.col("in_degree")).cast("long").alias("d")
    )
    e = (
        graph.edges.select("src", "dst")
        .join(deg.select(F.col("v").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dv")), "dst")
    )
    # two multiplicative rounds: the single affine pass is linear, so
    # small ids (hub 0..k) would land at small h and always be kept —
    # the second multiply spreads them across [0, P)
    h1 = F.pmod(
        F.pmod(F.col("src"), F.lit(HASH_P)) * HASH_A
        + F.pmod(F.col("dst"), F.lit(HASH_P)) * HASH_B
        + F.lit(int(seed)),
        F.lit(HASH_P),
    )
    h = F.pmod(h1 * HASH_A + F.lit(int(seed)), F.lit(HASH_P))
    isq = F.floor(F.sqrt((F.col("du") * F.col("dv")).cast("double"))).cast(
        "long"
    )
    return e.where(h * isq < int(c) * HASH_P).select("src", "dst")
