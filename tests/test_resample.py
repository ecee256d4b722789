"""Resampling kernels: unbiasedness and variance structure of all three
methods (reference test/resample.jl checks seeded goldens; RNG streams don't
transfer, so we check the defining statistical properties instead —
SURVEY.md §4 implication (1))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smc_tpu.ops.resample import resample


def _weights(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.exponential(size=n)
    return jnp.asarray(w)


@pytest.mark.parametrize("method", ["systematic", "multinomial", "polyalgo",
                                    "stratified", "metropolis"])
def test_unbiased_counts(method):
    """E[#copies of i] = N * w_i for every method."""
    w = _weights(200)
    wn = np.asarray(w / w.sum())
    n = 200
    counts = np.zeros(n)
    reps = 400
    for r in range(reps):
        idx = np.asarray(resample(jax.random.PRNGKey(r), w, method=method))
        counts += np.bincount(idx, minlength=n)
    expected = reps * n * wn
    # Chi^2-ish check: relative error of total counts small
    err = np.abs(counts - expected) / np.maximum(expected, 1.0)
    assert np.median(err) < 0.25


def test_systematic_counts_within_floor_ceil():
    """Systematic resampling guarantees #copies in {floor(Nw), ceil(Nw)}."""
    w = _weights(64, seed=3)
    wn = np.asarray(w / w.sum())
    n = 64
    for r in range(20):
        idx = np.asarray(resample(jax.random.PRNGKey(r), w, method="systematic"))
        counts = np.bincount(idx, minlength=n)
        assert np.all(counts >= np.floor(n * wn) - 1e-9)
        assert np.all(counts <= np.ceil(n * wn) + 1e-9)


def test_degenerate_weight_selects_single_particle():
    w = jnp.asarray(np.r_[np.zeros(9), 1.0])
    for method in ("systematic", "multinomial", "polyalgo", "stratified"):
        idx = np.asarray(resample(jax.random.PRNGKey(0), w, method=method))
        assert np.all(idx == 9)


def test_n_parts_subsample():
    """Bridge path draws fewer indices (reference src/smc_main.jl:262-270)."""
    w = _weights(100)
    idx = np.asarray(resample(jax.random.PRNGKey(0), w, method="systematic",
                              n_parts=37))
    assert idx.shape == (37,)
    assert idx.min() >= 0 and idx.max() < 100


def test_invalid_method_raises():
    with pytest.raises(ValueError, match="Invalid resampler"):
        resample(jax.random.PRNGKey(0), _weights(10), method="bogus")


def test_uniform_weights_systematic_is_identity():
    """With exactly uniform weights and any offset, systematic resampling
    maps spoke i into cell i."""
    n = 50
    w = jnp.ones(n)
    idx = np.asarray(resample(jax.random.PRNGKey(0), w, method="systematic"))
    np.testing.assert_array_equal(idx, np.arange(n))
