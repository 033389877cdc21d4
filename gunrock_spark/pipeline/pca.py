"""PCA top principal component by power iteration — the whitening /
dimensionality step in front of IVF/quantized ANN indexes (Jégou et
al. 2011 product quantization preprocesses with PCA; OPQ likewise).

Power iteration on the covariance never materializes the d×d matrix:
each step is two passes over the data expressed as Catalyst
aggregations,

    s_i = (x_i - mu) . v          (per-row projection, array ops)
    u_d = sum_i s_i * (x_i - mu)_d  (per-dimension sum, d-key groupBy)
    v   = u / ||u||

with v (d doubles) held driver-side like the IVF centroid table —
bounded state, broadcast into the next step as literals. A FIXED
iteration count from a FIXED start vector makes the whole trajectory
deterministic: both the engine and the SQL oracle compute the same
point of the same contraction, so results agree to float noise and
convergence tolerance never enters the contract.

Scale shape: per iteration one scan + one d-key partial-agg shuffle
(d = embedding width, e.g. 64–1024) + a d-row collect. No |n|-sized
driver state, no Python in the hot path.

Reference analog: none (graph engine); extends the similarity family
of ``pipeline/similarity.py`` (IVF uses the same bounded-centroid
pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

PCA_ITER = 8


def _lit_array(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def _dot(arr, lits):
    return F.aggregate(
        F.zip_with(arr, lits, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )


def pca_power_iteration(
    df: DataFrame,
    vec_col: str = "embedding",
    n_iter: int = PCA_ITER,
) -> tuple[list[float], list[float]]:
    """(mu, v): the per-dimension mean and the unit top-PC direction
    after exactly ``n_iter`` power steps from the uniform start
    vector 1/sqrt(d). Runs 1 + n_iter Spark jobs."""
    x = F.col(vec_col).cast("array<double>")
    mu_rows = (
        df.select(F.posexplode(x).alias("dim", "val"))
        .groupBy("dim")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    mu = [0.0] * len(mu_rows)
    for r in mu_rows:
        mu[r["dim"]] = float(r["m"])
    d = len(mu)
    if d == 0:
        return [], []
    centered = df.select(
        F.zip_with(x, _lit_array(mu), lambda a, b: a - b).alias("x")
    )
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(n_iter):
        s = _dot(F.col("x"), _lit_array(v))
        u_rows = (
            centered.select(s.alias("s"), F.posexplode("x").alias("dim", "val"))
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("s")).alias("u"))
            .collect()
        )
        u = [0.0] * d
        for r in u_rows:
            u[r["dim"]] = float(r["u"])
        nrm = math.sqrt(sum(w * w for w in u))
        if nrm == 0.0:
            break
        v = [w / nrm for w in u]
    return mu, v


def pca_top_components(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    n_iter: int = PCA_ITER,
) -> tuple[list[float], list[list[float]]]:
    """(mu, [v1, v2, ...]): the top ``n_components`` principal
    directions by sequential power iteration with DEFLATION — after
    extracting v_k, every row is deflated to x' = x - (x . v_k) v_k
    (an array expression with v_k as literals), so the next power
    iteration converges to the leading direction of the residual
    covariance P C P. Same fixed-trajectory determinism contract as
    :func:`pca_power_iteration`: fixed start, fixed iteration count,
    driver-side d-double state only.

    Scale shape per component: n_iter x (one scan + one d-key
    partial-agg shuffle + d-row collect); the deflation adds one
    array projection to the scan, never a materialized copy.
    """
    x = F.col(vec_col).cast("array<double>")
    mu_rows = (
        df.select(F.posexplode(x).alias("dim", "val"))
        .groupBy("dim")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    mu = [0.0] * len(mu_rows)
    for r in mu_rows:
        mu[r["dim"]] = float(r["m"])
    d = len(mu)
    if d == 0:
        return [], []
    cur = df.select(
        F.zip_with(x, _lit_array(mu), lambda a, b: a - b).alias("x")
    )
    comps: list[list[float]] = []
    for _ in range(n_components):
        v = [1.0 / math.sqrt(d)] * d
        for _ in range(n_iter):
            s = _dot(F.col("x"), _lit_array(v))
            u_rows = (
                cur.select(s.alias("s"), F.posexplode("x").alias("dim", "val"))
                .groupBy("dim")
                .agg(F.sum(F.col("val") * F.col("s")).alias("u"))
                .collect()
            )
            u = [0.0] * d
            for r in u_rows:
                u[r["dim"]] = float(r["u"])
            nrm = math.sqrt(sum(w * w for w in u))
            if nrm == 0.0:
                break
            v = [w / nrm for w in u]
        comps.append(v)
        vl = _lit_array(v)
        sv = _dot(F.col("x"), vl)
        cur = cur.select(
            F.zip_with(F.col("x"), vl, lambda a, b: a - sv * b).alias("x")
        )
    return mu, comps


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    n_iter: int = PCA_ITER,
) -> DataFrame:
    """(dim, mu, loading) — the mean vector and unit top-PC loading
    per dimension, as a d-row DataFrame."""
    spark = df.sparkSession
    mu, v = pca_power_iteration(df, vec_col=vec_col, n_iter=n_iter)
    return spark.createDataFrame(
        [(i, mu[i], v[i]) for i in range(len(mu))],
        schema="dim int, mu double, loading double",
    )


def pca_project(
    df: DataFrame,
    mu: list[float],
    v: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score): each row's projection onto the component — one
    narrow array expression, no shuffle."""
    x = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(x, _lit_array(mu), lambda a, b: a - b)
    return df.select(
        F.col(id_col), _dot(centered, _lit_array(v)).alias("score")
    )
