"""Double-float (two-f32) arithmetic: each op must agree with true f64 to
~2^-45 relative — the accuracy class the Pallas DSGE kernels rely on
(ops/df64.py; XLA's own TPU f64 emulation is the same construction)."""

import numpy as np
import jax
import jax.numpy as jnp

from smc_tpu.ops import df64 as df


def _pairs(seed, n=4096, scale=1.0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) * scale * 10.0 ** rng.integers(-6, 7, n))
    return x


def _check(op_df, op_np, x64, y64=None, rtol=2.0 ** -44):
    """Error measured relative to the OPERAND scale, not the result: like
    every double-double library (and XLA's own TPU f64 emulation), additive
    cancellation keeps absolute error ~ eps * (|x| + |y|), so a nearly
    cancelled sum has large relative-to-result error by construction."""
    xs = df.split_f64(jnp.asarray(x64))
    if y64 is None:
        got = df.merge_f64(*op_df(xs))
        want = op_np(x64)
        scale = np.abs(want)
    else:
        ys = df.split_f64(jnp.asarray(y64))
        got = df.merge_f64(*op_df(xs, ys))
        want = op_np(x64, y64)
        scale = np.maximum(np.abs(want), np.maximum(np.abs(x64), np.abs(y64)))
    err = np.abs(np.asarray(got) - want)
    assert np.max(err / np.maximum(scale, 1e-300)) < rtol


def test_split_merge_roundtrip():
    x = _pairs(0)
    xs = df.split_f64(jnp.asarray(x))
    back = np.asarray(df.merge_f64(*xs))
    # f32 pair holds ~49 bits: relative error <= 2^-46 on the roundtrip
    np.testing.assert_allclose(back, x, rtol=2.0 ** -46)


def test_two_sum_exact():
    a = jnp.float32(1e8)
    b = jnp.float32(1.0)
    s, e = df.two_sum(a, b)
    assert float(s) + float(e) == 1e8 + 1.0


def test_two_prod_exact():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = df.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)  # EXACT by construction


def test_add():
    _check(df.df_add, np.add, _pairs(1), _pairs(2))


def test_sub():
    _check(df.df_sub, np.subtract, _pairs(3), _pairs(4))


def test_mul():
    _check(df.df_mul, np.multiply, _pairs(5), _pairs(6))


def test_div():
    y = _pairs(8)
    y = np.where(np.abs(y) < 1e-3, 1.0, y)
    _check(df.df_div, np.divide, _pairs(7), y)


def test_recip():
    y = _pairs(9)
    y = np.where(np.abs(y) < 1e-3, 1.0, y)
    _check(df.df_recip, lambda v: 1.0 / v, y)


def test_sqrt():
    x = np.abs(_pairs(10)) + 1e-6
    _check(df.df_sqrt, np.sqrt, x)


def test_chained_dot_product_accuracy():
    """A 64-term FMA chain (the kernel's matmul shape) stays ~1e-13 relative
    of the f64 result."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((64, 512))
    b = rng.standard_normal((64, 512))
    aa = [df.split_f64(jnp.asarray(a[i])) for i in range(64)]
    bb = [df.split_f64(jnp.asarray(b[i])) for i in range(64)]
    acc = df.df_from_f32(jnp.zeros(512, jnp.float32))
    for i in range(64):
        acc = df.df_fma(aa[i], bb[i], acc)
    got = np.asarray(df.merge_f64(*acc))
    want = np.sum(a * b, axis=0)
    scale = np.sum(np.abs(a * b), axis=0)
    assert np.max(np.abs(got - want) / scale) < 1e-13
