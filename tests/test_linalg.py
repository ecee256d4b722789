"""Batched small-matrix Gauss-Jordan kernels (ops/linalg.py) vs numpy."""

import numpy as np
import jax.numpy as jnp

from smc_tpu.ops.linalg import gj_solve, gj_inv, small_psd_logdet_solve


def test_gj_solve_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 7, 7))
    B = rng.normal(size=(5, 7, 3))
    X = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(B)))
    for i in range(5):
        np.testing.assert_allclose(X[i], np.linalg.solve(A[i], B[i]),
                                   rtol=1e-9, atol=1e-11)


def test_gj_solve_needs_pivoting():
    """Zero leading pivot: partial pivoting must handle it."""
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    B = np.array([[2.0], [3.0]])
    X = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(X, [[3.0], [2.0]], rtol=1e-12)


def test_gj_inv():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 6, 6)) + 2 * np.eye(6)
    Ainv = np.asarray(gj_inv(jnp.asarray(A)))
    for i in range(3):
        np.testing.assert_allclose(Ainv[i] @ A[i], np.eye(6), atol=1e-9)


def test_gj_logabsdet():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(4, 5, 5))
    _, lad = gj_solve(jnp.asarray(A), jnp.asarray(np.zeros((4, 5, 1))),
                      return_logabsdet=True)
    expected = np.linalg.slogdet(A)[1]
    np.testing.assert_allclose(np.asarray(lad), expected, rtol=1e-9)


def test_small_psd_logdet_solve():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(6, 6))
    F = M @ M.T + 3 * np.eye(6)
    b = rng.normal(size=(6, 2))
    X, logdet = small_psd_logdet_solve(jnp.asarray(F), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(F, b),
                               rtol=1e-9)
    np.testing.assert_allclose(float(logdet), np.linalg.slogdet(F)[1],
                               rtol=1e-10)


def test_singular_yields_nonfinite():
    A = np.zeros((2, 2))
    X = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(np.ones((2, 1)))))
    assert not np.all(np.isfinite(X))
