"""Optimizer tests on analytic objectives with known minima.

Mirrors /root/reference/test/src/optimization_test.cpp:38-93.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fdapde_core_tpu.optimization import bfgs, gradient_descent, grid_search, newton


def quadratic(x):
    return (x[0] - 1.0) ** 2 + 4.0 * (x[1] + 2.0) ** 2


def rosenbrock(x):
    return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2


def test_grid_search():
    xs = jnp.linspace(-2, 2, 41)
    grid = jnp.stack(jnp.meshgrid(xs, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    res = grid_search(quadratic, grid)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -2.0], atol=0.11)


def test_gradient_descent_with_backtracking():
    res = gradient_descent(
        quadratic,
        jnp.array([5.0, 5.0]),
        step=1.0,
        tol=1e-8,
        max_iter=2000,
        line_search="backtracking",
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -2.0], atol=1e-6)


def test_newton_quadratic_one_step():
    res = newton(quadratic, jnp.array([8.0, -5.0]))
    assert int(res.n_iter) == 1  # exact on quadratics
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -2.0], atol=1e-12)


def test_newton_rosenbrock():
    res = newton(rosenbrock, jnp.array([-1.2, 1.0]), max_iter=100, tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-8)


def test_bfgs_rosenbrock_wolfe():
    res = bfgs(
        rosenbrock,
        jnp.array([-1.2, 1.0]),
        tol=1e-8,
        max_iter=500,
        line_search="wolfe",
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)


def test_bfgs_quadratic():
    res = bfgs(quadratic, jnp.array([8.0, -5.0]), line_search="backtracking")
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -2.0], atol=1e-6)


def test_optimizers_are_jittable():
    import jax

    jitted = jax.jit(lambda x0: newton(quadratic, x0).x)
    np.testing.assert_allclose(
        np.asarray(jitted(jnp.array([3.0, 3.0]))), [1.0, -2.0], atol=1e-10
    )
