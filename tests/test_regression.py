"""Smoothing regression: the downstream physics-informed estimation task."""

import numpy as np
import pytest

import fdapde_core_tpu as fdm
from fdapde_core_tpu.geometry.structured import unit_square_mesh
from fdapde_core_tpu.models import SmoothingRegression

PI = np.pi


def _truth(p):
    return np.sin(2 * PI * p[..., 0]) * np.cos(2 * PI * p[..., 1])


def test_smoothing_recovers_field():
    rng = np.random.default_rng(0)
    n_obs = 2000
    locs = rng.uniform(0.0, 1.0, size=(n_obs, 2))
    sigma = 0.2
    y = _truth(locs) + sigma * rng.normal(size=n_obs)

    model = SmoothingRegression(unit_square_mesh(24), -fdm.laplacian(), order=1)
    model.fit(locs, y, lam=1.0)
    grid = rng.uniform(0.1, 0.9, size=(300, 2))
    pred = np.asarray(model.predict(grid))
    rmse = float(np.sqrt(((pred - _truth(grid)) ** 2).mean()))
    assert rmse < sigma / 3  # denoising: well below the raw noise level
    assert bool(model.solve_info_.converged)


def test_lambda_grid_selection():
    rng = np.random.default_rng(1)
    locs = rng.uniform(0.0, 1.0, size=(800, 2))
    y = _truth(locs) + 0.1 * rng.normal(size=800)
    model = SmoothingRegression(unit_square_mesh(16), -fdm.laplacian())
    lambdas = [1e-8, 1e-2, 1.0, 1e4]
    best, errs = model.select_lambda(locs, y, lambdas)
    # extreme under/over-smoothing must lose to a middle lambda
    assert best in (1e-2, 1.0)
    assert errs[np.argmin(errs)] < errs[-1]
