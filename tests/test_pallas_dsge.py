"""Pallas fused DSGE kernels: df64 matrix helpers against numpy f64, and
interpret-mode kernel parity against the XLA batch-last path (the round-3
VERDICT's 1e-9 parity obligation for the Pallas fast path).

Interpret mode runs the kernels' exact op stream (including the two-f32
double-float arithmetic) on CPU, so these tests pin the kernel math without
TPU hardware; the compiled-kernel timing lives in benchmarks/bench_as_tpu.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smc_tpu.ops import df64 as df
from smc_tpu.ops.pallas_dsge import (mat_mul_df, gj_solve_df,
                                     cofactor_solve3_df,
                                     spectral_bound_neg_log,
                                     pallas_solve_linear_re,
                                     pallas_kalman_chandrasekhar,
                                     pallas_dsge_loglike)


def _df_mat(x64):
    """numpy [r, c] or [r, c, N] f64 -> list-of-lists of (hi, lo) pairs."""
    return [[df.split_f64(jnp.asarray(x64[i, j]))
             for j in range(x64.shape[1])] for i in range(x64.shape[0])]


def _back(mat):
    return np.array([[np.asarray(df.merge_f64(*e)) for e in row]
                     for row in mat])


def test_mat_mul_df_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6, 256))
    B = rng.standard_normal((6, 6, 256))
    got = _back(mat_mul_df(_df_mat(A), _df_mat(B)))
    want = np.einsum("ijn,jkn->ikn", A, B)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_gj_solve_df_matches_numpy():
    rng = np.random.default_rng(1)
    n, m, N = 6, 12, 128
    A = rng.standard_normal((n, n, N))
    B = rng.standard_normal((n, m, N))
    got = _back(gj_solve_df(_df_mat(A), _df_mat(B)))
    want = np.stack([np.linalg.solve(A[..., k], B[..., k])
                     for k in range(N)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


def test_gj_solve_df_needs_pivoting_case():
    """Zero leading pivot forces a row swap."""
    A = np.array([[0.0, 1.0], [1.0, 0.0]])[:, :, None] * np.ones(8)
    B = np.array([[2.0], [3.0]])[:, :, None] * np.ones(8)
    got = _back(gj_solve_df(_df_mat(A), _df_mat(B)))
    np.testing.assert_allclose(got[:, 0, 0], [3.0, 2.0], rtol=1e-12)


def test_cofactor_solve3_df_matches_numpy():
    rng = np.random.default_rng(2)
    N = 256
    G = rng.standard_normal((3, 3, N))
    F = np.einsum("ijn,kjn->ikn", G, G) + 0.5 * np.eye(3)[:, :, None]
    B = rng.standard_normal((3, 4, N))
    X, det = cofactor_solve3_df(_df_mat(F), _df_mat(B))
    want = np.stack([np.linalg.solve(F[..., k], B[..., k])
                     for k in range(N)], axis=-1)
    np.testing.assert_allclose(_back(X), want, rtol=1e-10, atol=1e-12)
    det_np = np.asarray(df.merge_f64(*det))
    want_det = np.array([np.linalg.det(F[..., k]) for k in range(N)])
    np.testing.assert_allclose(det_np, want_det, rtol=1e-11)


def test_spectral_bound_f32_agrees_with_f64_path():
    from smc_tpu.models.dsge import _spectral_radius_bound
    rng = np.random.default_rng(3)
    for rho_target in (0.3, 0.9, 0.99, 1.05):
        M = rng.standard_normal((6, 6))
        M = M / np.max(np.abs(np.linalg.eigvals(M))) * rho_target
        M32 = [[jnp.float32(M[i, j]) * jnp.ones((8, 128), jnp.float32)
                for j in range(6)] for i in range(6)]
        neg_log = np.asarray(spectral_bound_neg_log(M32))[0, 0]
        f64_bound = float(_spectral_radius_bound(jnp.asarray(M)))
        assert (neg_log < 0.0) == (f64_bound < 1.0), rho_target


# ---------------------------------------------------------------------------
# Fast-suite kernel smoke: tiny synthetic system so the interpret-mode
# kernels trace/compile in seconds (the AS-scale parity tests below unroll
# ~10^4-op df64 bodies and take minutes of XLA-CPU compile -> slow suite)
# ---------------------------------------------------------------------------


def test_pallas_kernels_tiny_system_parity():
    from smc_tpu.models.dsge import (bl_solve_linear_re,
                                     bl_kalman_loglike_chandrasekhar)
    rng = np.random.default_rng(5)
    N = 64
    n_s = 3
    # backward-looking stable system: B x_t = -A x_{t-1} - D eps
    A = np.zeros((n_s, n_s, N))
    B = np.zeros((n_s, n_s, N))
    C = np.zeros((n_s, n_s, N))
    D = np.zeros((n_s, 3, N))
    for k in range(N):
        rho = rng.uniform(0.2, 0.8, n_s)
        B[..., k] = np.eye(n_s)
        A[..., k] = -np.diag(rho)
        D[..., k] = -np.eye(n_s)
    Xp, Mp, okp = pallas_solve_linear_re(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        n_iter=4, interpret=True)
    Xx, Mx, okx = bl_solve_linear_re(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        n_iter=4)
    np.testing.assert_array_equal(np.asarray(okp), np.asarray(okx))
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xx),
                               rtol=1e-10, atol=1e-12)

    Q = np.tile(np.eye(3)[:, :, None], (1, 1, N))
    Z = np.tile(np.eye(3)[:, :, None], (1, 1, N)) * 1.5
    d = np.zeros((3, N))
    H = np.tile((0.1 * np.eye(3))[:, :, None], (1, 1, N))
    data = rng.standard_normal((3, 5))
    args = tuple(jnp.asarray(v) for v in (Xx, Mx, Q, Z, d, H, data))
    ll_p = pallas_kalman_chandrasekhar(*args, lyap_iter=12, interpret=True)
    ll_x = bl_kalman_loglike_chandrasekhar(*args)
    # rtol 2e-7, not ~1e-13: under jit-on-CPU, XLA can rematerialize a mul
    # into a consumer fusion and FMA-contract it, costing the df64 EFTs an
    # f32-sized lo-word error (ops/df64.py module note). The Mosaic-compiled
    # kernel does not pass through XLA fusion; its true parity is asserted
    # on-chip (benchmarks/bench_as_tpu.py).
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_x), rtol=2e-7)


# ---------------------------------------------------------------------------
# Interpret-mode kernel parity vs the XLA batch-last path on real AS draws
# (slow: the unrolled df64 kernel bodies cost minutes of XLA-CPU compile)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def as_draws():
    from smc_tpu.params import ParamSpace
    from smc_tpu.models.as_dsge import an_schorfheide, an_schorfheide_parameters
    model = an_schorfheide()
    space = ParamSpace(an_schorfheide_parameters())
    key = jax.random.PRNGKey(7)
    thetas = space.sample_prior(key, 256)
    A, B, C, D = jax.vmap(model.system_fn)(thetas)
    Q = jax.vmap(model.shock_cov_fn)(thetas)
    d_obs, Z, H = jax.vmap(model.measurement_fn)(thetas)
    bl = lambda x: jnp.moveaxis(x, 0, -1)
    return (model, thetas, bl(A), bl(B), bl(C), bl(D), bl(Q), bl(Z),
            jnp.moveaxis(d_obs, 0, -1), bl(H))


@pytest.mark.slow
def test_pallas_re_solve_parity(as_draws):
    from smc_tpu.models.dsge import bl_solve_linear_re
    _, _, A, B, C, D, *_ = as_draws
    Xp, Mp, okp = pallas_solve_linear_re(A, B, C, D, interpret=True)
    Xx, Mx, okx = bl_solve_linear_re(A, B, C, D)
    okp_, okx_ = np.asarray(okp), np.asarray(okx)
    # determinacy decisions agree except possibly within the f32 spectral
    # fuzz at the unit circle — require > 99% agreement and full agreement
    # on the solution values where both accept
    assert np.mean(okp_ == okx_) > 0.99
    both = okp_ & okx_
    np.testing.assert_allclose(np.asarray(Xp)[..., both],
                               np.asarray(Xx)[..., both],
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Mp)[..., both],
                               np.asarray(Mx)[..., both],
                               rtol=1e-7, atol=1e-9)


@pytest.mark.slow
def test_pallas_kalman_parity(as_draws):
    from smc_tpu.models.dsge import (bl_solve_linear_re,
                                     bl_kalman_loglike_chandrasekhar)
    from smc_tpu.models.as_dsge import generate_as_data
    model, thetas, A, B, C, D, Q, Z, d_obs, H = as_draws
    data = generate_as_data(T=80, seed=1793)
    X, M, ok = bl_solve_linear_re(A, B, C, D)
    ll_p = pallas_kalman_chandrasekhar(X, M, Q, Z, d_obs, H,
                                       jnp.asarray(data), interpret=True)
    ll_x = bl_kalman_loglike_chandrasekhar(X, M, Q, Z, d_obs, H,
                                           jnp.asarray(data))
    ll_p, ll_x = np.asarray(ll_p), np.asarray(ll_x)
    ok_ = np.asarray(ok)
    finite = np.isfinite(ll_p) & np.isfinite(ll_x) & ok_
    assert np.mean((np.isfinite(ll_p) == np.isfinite(ll_x))[ok_]) > 0.99
    assert finite.sum() > 50
    # Compare COMPETITIVE lanes only (ll within 1e4 nats of the max):
    # prior-tail draws at quasi-divergent filter states produce different
    # garbage under any two arithmetics and carry zero posterior weight
    # (measured on-chip: every outlier lane's ll < -6e5 vs best -1428).
    # rtol 1e-7 on CPU (XLA remat+FMA contraction, ops/df64.py note); the
    # 1e-9-class parity of the compiled kernel is asserted on-chip.
    comp = finite & (ll_x > ll_x[finite].max() - 1e4)
    assert comp.sum() > 50
    np.testing.assert_allclose(ll_p[comp], ll_x[comp], rtol=1e-7)


@pytest.mark.slow
def test_pallas_full_loglike_parity(as_draws):
    model, thetas, A, B, C, D, Q, Z, d_obs, H = as_draws
    from smc_tpu.models.as_dsge import generate_as_data
    data = generate_as_data(T=80, seed=1793)
    ll_p = np.asarray(pallas_dsge_loglike(A, B, C, D, Q, Z, d_obs, H,
                                          jnp.asarray(data), interpret=True))
    ll_x = np.asarray(model.loglike_batched(thetas, data))
    finite = np.isfinite(ll_p) & np.isfinite(ll_x)
    assert np.mean(np.isfinite(ll_p) == np.isfinite(ll_x)) > 0.99
    assert finite.sum() > 50
    comp = finite & (ll_x > ll_x[finite].max() - 1e4)  # see kalman test
    assert comp.sum() > 50
    np.testing.assert_allclose(ll_p[comp], ll_x[comp], rtol=1e-7)


@pytest.mark.slow
def test_pallas_padding_roundtrip(as_draws):
    """Non-multiple-of-1024 N pads internally and slices back."""
    _, _, A, B, C, D, *_ = as_draws
    sl = lambda x: x[..., :100]
    Xp, Mp, okp = pallas_solve_linear_re(sl(A), sl(B), sl(C), sl(D),
                                         interpret=True)
    assert Xp.shape[-1] == 100 and okp.shape == (100,)
    Xf, Mf, okf = pallas_solve_linear_re(A, B, C, D, interpret=True)
    np.testing.assert_array_equal(np.asarray(okp), np.asarray(okf)[:100])
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xf)[..., :100],
                               rtol=0, atol=0)


def test_kalman_nan_lane_does_not_poison_tile():
    """A NaN transition matrix in ONE lane must not corrupt the other lanes
    of its 1024-particle tile: the Lyapunov doubling early-exit reduces
    max|A_k| across the whole tile, and an un-sanitized NaN used to make
    that reduction NaN -> exit at iteration 0 -> every good lane silently
    got P0 = RQR (finite but wrong likelihoods). Round-4 ADVICE medium."""
    from smc_tpu.models.dsge import bl_solve_linear_re
    rng = np.random.default_rng(11)
    N = 64
    n_s = 3
    A = np.zeros((n_s, n_s, N))
    B = np.zeros((n_s, n_s, N))
    C = np.zeros((n_s, n_s, N))
    D = np.zeros((n_s, 3, N))
    for k in range(N):
        rho = rng.uniform(0.2, 0.8, n_s)
        B[..., k] = np.eye(n_s)
        A[..., k] = -np.diag(rho)
        D[..., k] = -np.eye(n_s)
    X, M, ok = bl_solve_linear_re(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        n_iter=4)
    Q = np.tile(np.eye(3)[:, :, None], (1, 1, N))
    Z = np.tile(np.eye(3)[:, :, None], (1, 1, N)) * 1.5
    d = np.zeros((3, N))
    H = np.tile((0.1 * np.eye(3))[:, :, None], (1, 1, N))
    data = rng.standard_normal((3, 5))
    args_clean = tuple(jnp.asarray(v) for v in (X, M, Q, Z, d, H, data))
    ll_clean = np.asarray(pallas_kalman_chandrasekhar(
        *args_clean, lyap_iter=12, interpret=True))
    X_bad = np.asarray(X).copy()
    X_bad[..., 17] = np.nan              # one poisoned lane, mid-tile
    args_bad = tuple(jnp.asarray(v)
                     for v in (X_bad, M, Q, Z, d, H, data))
    ll_bad = np.asarray(pallas_kalman_chandrasekhar(
        *args_bad, lyap_iter=12, interpret=True))
    assert ll_bad[17] == -np.inf         # the NaN lane is flagged bad
    keep = np.arange(N) != 17
    np.testing.assert_array_equal(ll_bad[keep], ll_clean[keep])


def test_re_solve_nan_lane_does_not_poison_tile():
    """Mirror of the Kalman NaN-lane test for the RE solve's early-exit CR
    loop: a NaN lane must neither trigger the tile-wide early exit at
    iteration 0 (NaN -> inf in the convergence reduction) nor inflate the
    tile's convergence scale to inf (NaN -> 0 in the scale reduction).
    Good lanes keep bit-identical solutions; the NaN lane gets ok=False."""
    rng = np.random.default_rng(13)
    N = 64
    n_s = 3
    A = np.zeros((n_s, n_s, N))
    B = np.zeros((n_s, n_s, N))
    C = np.zeros((n_s, n_s, N))
    D = np.zeros((n_s, 3, N))
    for k in range(N):
        rho = rng.uniform(0.2, 0.8, n_s)
        B[..., k] = np.eye(n_s)
        A[..., k] = -np.diag(rho)
        D[..., k] = -np.eye(n_s)
    Xc, Mc, okc = pallas_solve_linear_re(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        n_iter=6, interpret=True)
    A_bad = A.copy()
    A_bad[0, 0, 23] = np.nan
    Xb, Mb, okb = pallas_solve_linear_re(
        jnp.asarray(A_bad), jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        n_iter=6, interpret=True)
    okb_, okc_ = np.asarray(okb), np.asarray(okc)
    assert not okb_[23]
    keep = np.arange(N) != 23
    np.testing.assert_array_equal(okb_[keep], okc_[keep])
    np.testing.assert_array_equal(np.asarray(Xb)[..., keep],
                                  np.asarray(Xc)[..., keep])
