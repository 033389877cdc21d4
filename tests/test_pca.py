"""PCA power iteration vs an exact numpy replay of the same trajectory."""

import math

import numpy as np
import pytest

from gunrock_spark.pipeline.pca import (
    pca_power_iteration,
    pca_project,
    pca_top_component,
)


def _data(n=60, d=6, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    base[:, 0] *= 5.0  # dominant direction along dim 0
    base[:, 1] *= 2.0
    return base


def _np_power(x, n_iter=8):
    mu = x.mean(axis=0)
    c = x - mu
    d = x.shape[1]
    v = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(n_iter):
        s = c @ v
        u = c.T @ s
        v = u / np.linalg.norm(u)
    return mu, v


def test_power_iteration_matches_numpy(spark):
    x = _data()
    df = spark.createDataFrame(
        [(i, [float(w) for w in row]) for i, row in enumerate(x)],
        schema="vec_id long, embedding array<double>",
    )
    mu, v = pca_power_iteration(df, n_iter=8)
    emu, ev = _np_power(x, n_iter=8)
    assert np.allclose(mu, emu, atol=1e-9)
    assert np.allclose(v, ev, atol=1e-9)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)
    # the dominant direction is (+-) dim 0
    assert abs(v[0]) > 0.9


def test_top_component_df_and_projection(spark):
    x = _data()
    df = spark.createDataFrame(
        [(i, [float(w) for w in row]) for i, row in enumerate(x)],
        schema="vec_id long, embedding array<double>",
    )
    comp = pca_top_component(df, n_iter=8)
    rows = {r["dim"]: (r["mu"], r["loading"]) for r in comp.collect()}
    assert len(rows) == x.shape[1]
    mu, v = _np_power(x)
    scores = {
        r["vec_id"]: r["score"] for r in pca_project(df, list(mu), list(v)).collect()
    }
    exp = (x - mu) @ v
    for i in range(x.shape[0]):
        assert scores[i] == pytest.approx(float(exp[i]), abs=1e-9)


def _np_power_deflate(x, n_components=2, n_iter=8):
    mu = x.mean(axis=0)
    c = x - mu
    d = x.shape[1]
    comps = []
    for _ in range(n_components):
        v = np.full(d, 1.0 / math.sqrt(d))
        for _ in range(n_iter):
            s = c @ v
            u = c.T @ s
            v = u / np.linalg.norm(u)
        comps.append(v)
        c = c - np.outer(c @ v, v)
    return mu, comps


def test_top_components_deflation_matches_numpy(spark):
    from gunrock_spark.pipeline.pca import pca_top_components

    x = _data()
    df = spark.createDataFrame(
        [(i, [float(w) for w in row]) for i, row in enumerate(x)],
        schema="vec_id long, embedding array<double>",
    )
    mu, comps = pca_top_components(df, n_components=2, n_iter=8)
    emu, ecomps = _np_power_deflate(x, n_components=2, n_iter=8)
    assert np.allclose(mu, emu, atol=1e-9)
    assert np.allclose(comps[0], ecomps[0], atol=1e-9)
    assert np.allclose(comps[1], ecomps[1], atol=1e-8)
    # v2 orthogonal to v1 and aligned with the second-variance dim
    assert abs(np.dot(comps[0], comps[1])) < 1e-6
    assert abs(comps[1][1]) > 0.9
