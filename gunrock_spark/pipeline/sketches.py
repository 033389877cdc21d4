"""Bounded-memory sketches — Count-Min frequency estimation over the
token stream (Cormode & Muthukrishnan 2005) and HyperLogLog distinct
counting (Flajolet et al. 2007), the two sketches every 100 TB
pipeline carries.

At 100 TB the exact vocabulary (`text.term_counts`) is itself a big
shuffle; a Count-Min Sketch bounds the state to depth x width
counters REGARDLESS of vocabulary size, at the cost of one-sided
overestimation (est >= true; error <= 2N/width with prob
1 - 2^-depth). The sketch here is fully deterministic — hash rows are
affine functions of the engine's h60 (functions/hashing.py), with
coefficients derived from a seed string — so the ENTIRE sketch table
is bit-reproducible and oracle-checkable in SQL, unlike library
sketches with opaque seeds (e.g. Spark's own stat.countMinSketch).

Physical plan: one explode + one groupBy for the build (the depth
rows per token are generated inside the projection — no extra
shuffle, map-side combine absorbs the Zipf head exactly as in
term_counts); lookups are a broadcast-sized join against the sketch.

Merge at scale: sketches of two corpus shards merge by adding
counters (groupBy(row, col).sum) — the property that makes CMS the
standard distributed heavy-hitter tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gunrock_spark.functions.hashing import h60, h60_py, tokens

# modulus for the affine hash family: prime, small enough that
# a * (h60 % P) + b stays far below 2^63 (a, b < P ~ 1e9, h%P < 1e9
# -> product < 1e18)
CMS_P = 1_000_000_007


def _coeffs(depth: int, seed: str) -> list[tuple[int, int]]:
    """Deterministic per-row affine coefficients (a != 0)."""
    out = []
    for i in range(depth):
        a = h60_py(f"{seed}:a:{i}") % (CMS_P - 1) + 1
        b = h60_py(f"{seed}:b:{i}") % CMS_P
        out.append((a, b))
    return out


def _col_expr(term_col, a: int, b: int, width: int):
    hm = h60(term_col) % F.lit(CMS_P)
    return ((F.lit(a) * hm + F.lit(b)) % F.lit(CMS_P)) % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """(row int, col long, cnt long) — the CMS counter table over the
    corpus token stream. depth x width rows at most, whatever the
    corpus size; counters for absent (row, col) cells are implicitly
    zero (lookups coalesce)."""
    toks = tokens(F.lower(F.col(text_col)))
    exploded = df.select(F.explode(toks).alias("term"))
    cells = exploded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _col_expr(F.col("term"), a, b, width).alias("col"),
                    )
                    for i, (a, b) in enumerate(_coeffs(depth, seed))
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.row", "cell.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """(term, est) — point estimates: min over the depth counters a
    term hashes to. est >= true count always; equality whenever no
    collision on at least one row. The probe side is one narrow
    (term, row, col) table joined against the sketch — broadcast the
    sketch side in production (depth x width rows)."""
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _col_expr(F.col(term_col), a, b, width).alias("col"),
                    )
                    for i, (a, b) in enumerate(_coeffs(depth, seed))
                ]
            )
        ).alias("cell"),
    ).select("term", "cell.row", "cell.col")
    return (
        probes.join(cms, ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches built with identical (depth, width, seed):
    counters add."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count sketch
# ---------------------------------------------------------------------------
# rho is capped so 2^(HLL_RHO_CAP - rho) stays exact in BIGINT
# (m * 2^50 < 2^63 for every supported m); the cap is part of the
# deterministic contract (P(rho > 50) < 2^-50 per item — unreachable).
HLL_RHO_CAP = 50


def hll_alpha(m: int) -> float:
    """The standard HLL bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _check_m(m: int) -> int:
    b = m.bit_length() - 1
    if m < 16 or (1 << b) != m:
        raise ValueError("m must be a power of two >= 16")
    return b


def hll_registers(
    df: DataFrame, col: str = "text", m: int = 64, seed: str = "hll"
) -> DataFrame:
    """(j int, rho int) — the HLL register table: for every item,
    j = low log2(m) bits of h60(seed:x), rho = 1 + trailing-zero
    count of the remaining bits (geometric, P(rho=k) = 2^-k), and the
    register keeps the MAX rho. At most m rows whatever the corpus
    size; registers never hit stay implicitly 0.

    Pure Catalyst integer ops (bit ops + bit_count), bit-reproducible
    in DuckDB/ANSI SQL via the same md5-prefix hash — unlike Spark's
    approx_count_distinct whose register encoding is engine-private.
    """
    b = _check_m(m)
    c = F.col(col) if isinstance(col, str) else col
    h = h60(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    rem = F.shiftright(h, b)  # h >= 0, arithmetic shift == logical
    lowbit = rem.bitwiseAND(-rem)
    rho = (
        F.when(rem == 0, F.lit(HLL_RHO_CAP))
        .otherwise(F.least(F.bit_count(lowbit - 1) + 1, F.lit(HLL_RHO_CAP)))
        .cast("int")
    )
    return (
        df.select(h.bitwiseAND(F.lit(m - 1)).cast("int").alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge shard register tables built with identical (m, seed):
    registers take the max — the property that makes HLL the standard
    distributed distinct-count tool (union semantics, idempotent)."""
    if not registers:
        raise ValueError("need at least one register table")
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("j").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, m: int = 64) -> DataFrame:
    """One row (est_distinct long, zero_registers long, s_scaled long)
    from a register table.

    The harmonic sum is computed EXACTLY in integers —
    s_scaled = sum(2^(HLL_RHO_CAP - rho)) over all m registers
    (absent registers count as rho=0) — so the only float ops are one
    multiply/divide on identical exact operands in every engine, and
    the estimate is rounded to a whole count: bit-identical between
    Spark and a SQL oracle. Small-range correction (linear counting
    m*ln(m/V) when V zero registers remain and the raw estimate is
    under 2.5m) follows Flajolet et al. §4."""
    _check_m(m)
    spark = registers.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").cast("int").alias("j"))
        .join(registers, "j", "left")
        .select(F.coalesce("rho", F.lit(0)).alias("rho"))
    )
    agg = full.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - rho)")).alias(
            "s_scaled"
        ),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).cast("long").alias(
            "zero_registers"
        ),
    )
    two_pow_cap = float(1 << HLL_RHO_CAP)
    raw = F.lit(hll_alpha(m)) * m * m * F.lit(two_pow_cap) / F.col("s_scaled")
    est = F.when(
        (F.col("zero_registers") > 0) & (raw <= F.lit(2.5 * m)),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers"))),
    ).otherwise(F.round(raw))
    return agg.select(
        est.cast("long").alias("est_distinct"),
        F.col("zero_registers"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
    )


def hll_distinct(
    df: DataFrame, col: str = "text", m: int = 64, seed: str = "hll"
) -> DataFrame:
    """One-call distinct-count estimate: build registers, estimate."""
    return hll_estimate(hll_registers(df, col, m=m, seed=seed), m=m)


def hll_registers_by(
    df: DataFrame,
    group_cols: list[str],
    col: str = "text",
    m: int = 64,
    seed: str = "hll",
) -> DataFrame:
    """Grouped register tables: (group_cols..., j, rho) with at most
    m rows PER GROUP — the per-key distinct-count sketch (distinct
    terms per source, distinct urls per host). Same hash family and
    register encoding as hll_registers, so per-group tables merge
    with hll_merge-style max and estimate with hll_estimate_by."""
    b = _check_m(m)
    c = F.col(col) if isinstance(col, str) else col
    h = h60(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    rem = F.shiftright(h, b)
    lowbit = rem.bitwiseAND(-rem)
    rho = (
        F.when(rem == 0, F.lit(HLL_RHO_CAP))
        .otherwise(F.least(F.bit_count(lowbit - 1) + 1, F.lit(HLL_RHO_CAP)))
        .cast("int")
    )
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).cast("int").alias("j"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], m: int = 64
) -> DataFrame:
    """(group_cols..., est_distinct, zero_registers, s_scaled) per
    group. Needs NO m-row join: present registers always carry
    rho >= 1, so absent registers per group are m - count(*) and
    contribute 2^HLL_RHO_CAP each to the exact integer harmonic sum —
    one partial-agg groupBy over the sketch rows."""
    _check_m(m)
    two_cap = 1 << HLL_RHO_CAP
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - rho)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(two_cap)
        ).alias("s_scaled"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("zero_registers"),
    )
    raw = F.lit(hll_alpha(m)) * m * m * F.lit(float(two_cap)) / F.col("s_scaled")
    est = F.when(
        (F.col("zero_registers") > 0) & (raw <= F.lit(2.5 * m)),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers"))),
    ).otherwise(F.round(raw))
    return agg.select(
        *group_cols,
        est.cast("long").alias("est_distinct"),
        F.col("zero_registers"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
    )


def hll_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    col: str = "text",
    m: int = 64,
    seed: str = "hll",
) -> DataFrame:
    """One-call per-group distinct estimate."""
    return hll_estimate_by(
        hll_registers_by(df, group_cols, col, m=m, seed=seed), group_cols, m=m
    )


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch
# ---------------------------------------------------------------------------
# The third sketch every 100 TB dedup pipeline carries (Bloom 1970):
# CMS answers "how often", HLL answers "how many distinct", Bloom
# answers "have I seen this key" with zero false negatives — the
# standard incremental-ingest guard ("skip urls already crawled")
# where an exact distinct-key join would re-shuffle the full history
# every batch. Same affine h60 family as CMS, so the WHOLE bit set is
# bit-reproducible in ANSI SQL.


def _bloom_pos(col, a: int, b: int, m_bits: int):
    hm = h60(col) % F.lit(CMS_P)
    return ((F.lit(a) * hm + F.lit(b)) % F.lit(CMS_P)) % F.lit(m_bits)


def bloom_build(
    df: DataFrame,
    col: str = "text",
    m_bits: int = 8192,
    k: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """(pos long) — the SET bit positions of a Bloom filter over the
    column's values: pos_i(x) = ((a_i·(h60(x) mod P) + b_i) mod P)
    mod m_bits for i = 0..k-1. At most m_bits rows whatever the input
    size; unset bits are implicitly absent. One explode + one
    distinct — the same single-exchange shape as cms_build."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _bloom_pos(c, a, b, m_bits)
                        for a, b in _coeffs(k, seed)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge shard filters built with identical (m_bits, k, seed):
    bit sets union — the property that makes Bloom the standard
    distributed membership guard (idempotent, commutative)."""
    if not filters:
        raise ValueError("need at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    col: str = "term",
    m_bits: int = 8192,
    k: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """(<col>, maybe boolean) — membership verdict per probe value:
    true iff ALL k bit positions are set (possible false positive at
    rate ≈ (1 - e^(-kn/m))^k, never a false negative). The probe side
    is a narrow (value, pos) table joined against the filter —
    broadcast the filter side in production (≤ m_bits rows)."""
    c = F.col(col) if isinstance(col, str) else col
    probe_bits = probes.select(
        c.alias("_key"),
        F.explode(
            F.array(*[_bloom_pos(c, a, b, m_bits) for a, b in _coeffs(k, seed)])
        ).alias("pos"),
    )
    marked = probe_bits.join(
        bloom.withColumn("_hit", F.lit(1)), "pos", "left"
    )
    return (
        marked.groupBy(F.col("_key").alias(col if isinstance(col, str) else "key"))
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_hit", F.lit(0)))).alias("maybe"))
    )


# ---------------------------------------------------------------------------
# Log-binned histogram / quantile sketch
# ---------------------------------------------------------------------------
#
# The fourth bounded-memory sketch (CMS = frequency, HLL = distinct,
# Bloom = membership, this = QUANTILES): a deterministic base-2
# log-binned histogram over a non-negative integer measure (token
# counts, degrees, byte sizes). Bin geometry is PURE INTEGER math —
# octave o = floor(log2(x)) computed as len(bin(x)) - 1 and a linear
# sub-bin within the octave — so the sketch is bit-identical in any
# engine (no float log at bin boundaries, the classic cross-engine
# divergence). State is <= 63 * bins_per_octave rows regardless of
# data size; shards merge by summing counts per bin; relative value
# error of a quantile estimate is bounded by the octave subdivision
# (~1/bins_per_octave).


def _log2_int(bpo: int) -> int:
    lb = bpo.bit_length() - 1
    if bpo <= 0 or (1 << lb) != bpo:
        raise ValueError(f"bins_per_octave must be a power of two, got {bpo}")
    return lb


def _bin_sql(x: str, bpo: int) -> str:
    """Spark-SQL text for the bin id of integer column ``x``: -1 for
    x <= 0, else o*bpo + sub with o = floor(log2(x))
    (= len(bin(x)) - 1, integer-exact) and
    sub = floor((x - 2^o) * bpo / 2^o) — pure shifts, so the formula
    replays bit-identically in any engine (no float log at bin
    edges). PySpark's shiftleft() helper only takes a literal shift,
    hence SQL text (the SQL function accepts column shifts)."""
    lb = _log2_int(bpo)
    o = f"(length(bin({x})) - 1)"
    p2 = f"shiftleft(CAST(1 AS BIGINT), {o})"
    frac = f"(CAST({x} AS BIGINT) - {p2})"
    sub = (
        f"(CASE WHEN {o} >= {lb} THEN shiftright({frac}, {o} - {lb}) "
        f"ELSE shiftleft({frac}, {lb} - {o}) END)"
    )
    return (
        f"CASE WHEN {x} <= 0 THEN CAST(-1 AS BIGINT) "
        f"ELSE CAST({o} AS BIGINT) * {bpo} + CAST({sub} AS BIGINT) END"
    )


def _bin_lo_sql(b: str, bpo: int) -> str:
    """Spark-SQL text for the inclusive lower edge of bin id ``b``:
    0 for bin -1, else 2^o + floor(s * 2^o / bpo) — again pure
    shifts."""
    lb = _log2_int(bpo)
    o = f"CAST({b} DIV {bpo} AS INT)"
    s = f"({b} % {bpo})"
    p2 = f"shiftleft(CAST(1 AS BIGINT), {o})"
    off = (
        f"(CASE WHEN {o} >= {lb} "
        f"THEN {s} * shiftleft(CAST(1 AS BIGINT), {o} - {lb}) "
        f"ELSE shiftright(shiftleft({s}, {o}), {lb}) END)"
    )
    return f"CASE WHEN {b} < 0 THEN CAST(0 AS BIGINT) ELSE {p2} + {off} END"


def log_histogram(
    df: DataFrame, value_col: str, bins_per_octave: int = 8
) -> DataFrame:
    """DataFrame[bin, lo, n]: deterministic log-binned histogram of a
    non-negative integer column. One partial-agg groupBy over <= 63 *
    bins_per_octave distinct bins — the map-side combine means each
    task emits at most |bins| rows no matter how many values it saw."""
    return (
        df.select(F.expr(_bin_sql(value_col, bins_per_octave)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bin",
            F.expr(_bin_lo_sql("bin", bins_per_octave)).alias("lo"),
            "n",
        )
    )


def log_hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge shard histograms: sum counts per bin."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bin", "lo").agg(F.sum("n").cast("long").alias("n"))


def quantile_estimates(
    hist: DataFrame, qs: list[float], bins_per_octave: int = 8
) -> DataFrame:
    """DataFrame[q, est]: for each quantile q, the lower edge of the
    first bin whose cumulative count reaches q * N — the conservative
    (never-overshooting) estimator whose relative error is one octave
    subdivision. The cumulative window runs over the SKETCH (<= 63 *
    bins_per_octave rows), never the data."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    total = hist.agg(F.sum("n")).collect()[0][0] or 0
    qdf = spark.createDataFrame([(float(q),) for q in qs], schema="q double")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", "lo", F.sum("n").over(w).alias("cum"))
    hit = (
        qdf.join(cum, cum["cum"] >= qdf["q"] * F.lit(float(total)))
        .groupBy("q")
        .agg(F.min(F.struct("bin", "lo")).alias("t"))
    )
    return hit.select("q", F.col("t.lo").alias("est")).orderBy("q")
