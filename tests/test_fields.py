"""Field-layer tests: expression arithmetic, derivatives (auto vs FD vs
analytic), dot products.

Mirrors /root/reference/test/src/scalar_field_test.cpp / vector_field_test.cpp
semantics: numeric and analytic derivatives agree, expression algebra
composes pointwise.
"""

import jax.numpy as jnp
import numpy as np

from fdapde_core_tpu.fields import (
    DifferentiableScalarField,
    MatrixField,
    ScalarField,
    TwiceDifferentiableScalarField,
    VectorField,
)


def _f(x):
    return jnp.sin(x[0]) * x[1] ** 2 + jnp.exp(x[0] * x[1])


def _grad(x):
    return jnp.stack(
        [
            jnp.cos(x[0]) * x[1] ** 2 + x[1] * jnp.exp(x[0] * x[1]),
            2 * jnp.sin(x[0]) * x[1] + x[0] * jnp.exp(x[0] * x[1]),
        ]
    )


def test_expression_arithmetic():
    f = ScalarField(lambda x: x[0] ** 2)
    g = ScalarField(lambda x: x[1])
    h = 2.0 * f + g * g - f / (g + 3.0)
    x = jnp.array([2.0, 5.0])
    assert np.isclose(float(h(x)), 2 * 4 + 25 - 4 / 8)
    assert np.isclose(float((-f)(x)), -4.0)


def test_auto_gradient_matches_analytic():
    f = ScalarField(_f)
    x = jnp.array([0.7, -0.3])
    np.testing.assert_allclose(
        np.asarray(f.derive()(x)), np.asarray(_grad(x)), rtol=1e-12
    )


def test_fd_gradient_close_to_analytic():
    """Central differences with h=1e-3 (field_derivatives.h defaults)."""
    f = ScalarField(_f)
    x = jnp.array([0.7, -0.3])
    np.testing.assert_allclose(
        np.asarray(f.derive(mode="fd")(x)), np.asarray(_grad(x)), atol=1e-6
    )


def test_fd_hessian():
    f = ScalarField(lambda x: x[0] ** 2 * x[1] + x[1] ** 3)
    x = jnp.array([1.5, 2.0])
    expected = np.array([[2 * 2.0, 2 * 1.5], [2 * 1.5, 6 * 2.0]])
    np.testing.assert_allclose(
        np.asarray(f.derive_twice()(x)), expected, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f.derive_twice(mode="fd")(x)), expected, atol=1e-5
    )


def test_differentiable_field_override():
    """Analytic override takes precedence (differentiable_field.h:35-78)."""
    calls = []

    def fake_grad(x):
        calls.append(1)
        return jnp.array([42.0, 0.0])

    f = DifferentiableScalarField(_f, fake_grad)
    out = f.derive()(jnp.array([0.0, 0.0]))
    assert float(out[0]) == 42.0 and calls

    g = TwiceDifferentiableScalarField(
        _f, fake_grad, lambda x: jnp.eye(2) * 7.0
    )
    assert float(g.derive_twice()(jnp.zeros(2))[1, 1]) == 7.0


def test_vector_field_dot():
    v = VectorField([lambda x: x[0], lambda x: x[1]])
    w = jnp.array([2.0, 3.0])
    d = v.dot(w)
    assert float(d(jnp.array([1.0, 1.0]))) == 5.0
    d2 = v.dot(v)
    assert float(d2(jnp.array([3.0, 4.0]))) == 25.0


def test_matrix_field():
    K = MatrixField([[lambda x: x[0], lambda x: 0.0], [lambda x: 0.0, lambda x: x[1]]])
    x = jnp.array([2.0, 5.0])
    np.testing.assert_allclose(np.asarray(K(x)), [[2.0, 0.0], [0.0, 5.0]])
    mv = K.matvec(jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(mv(x)), [2.0, 5.0])
    prod = K @ K
    np.testing.assert_allclose(np.asarray(prod(x)), [[4.0, 0.0], [0.0, 25.0]])


def test_unary_math_functions():
    from fdapde_core_tpu import fields as ff

    f = ScalarField(lambda x: x[0])
    g = ff.sin(f) * ff.exp(f) + ff.cos(f) / ff.sqrt(f + 4.0)
    x = jnp.array([0.5])
    want = np.sin(0.5) * np.exp(0.5) + np.cos(0.5) / np.sqrt(4.5)
    assert np.isclose(float(g(x)), want)
    # derivatives flow through the composition
    d = g.derive()(x)
    h = 1e-7
    fd = (g(jnp.array([0.5 + h])) - g(jnp.array([0.5 - h]))) / (2 * h)
    assert np.isclose(float(d[0]), float(fd), rtol=1e-5)
