"""Double-float ("df64") arithmetic: f64-class values as unevaluated sums of
two f32s, built from error-free transformations.

Why this exists: TPU hardware has no f64 ALU. XLA emulates f64 on TPU by
rewriting every op into exactly this kind of f32-pair arithmetic — but that
rewrite CANNOT pass through a Pallas `tpu_custom_call` boundary (measured on
this box: "While rewriting computation to not contain X64 element types, XLA
encountered an HLO for which this rewriting is not implemented"). So a
Pallas kernel that needs f64-class accuracy — the fused DSGE likelihood,
where log-MDD accuracy demands better-than-f32 log-likelihoods — must carry
its own double-float arithmetic. These helpers are plain jnp functions on
(hi, lo) pairs of f32 arrays, usable both inside Pallas kernel bodies and in
ordinary traced code; precision is ~2^-48 relative per operation, the same
class as XLA's own TPU f64 emulation.

Algorithms: Knuth two-sum, Dekker split/two-product (no FMA assumed — TPU
f32 ops are IEEE with fastmath off, and an XLA-fused FMA only makes the
Dekker error term MORE exact), and the standard double-double add/mul/div
recipes (Hida-Li-Bailey QD / Thall's GPU formulation; see PAPERS.md).

The representation contract: value = hi + lo with |lo| <= ulp(hi)/2
(normalized). All functions take and return (hi, lo) tuples of f32 arrays
of any (broadcastable) shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32 (24-bit significand -> 12|12 split)

# KNOWN HAZARD (measured, round 4): when these ops run through XLA's
# *fusion* pipeline (plain jit on CPU — NOT the Pallas/Mosaic path), XLA
# may rematerialize a producer multiply into a consumer fusion and the CPU
# backend then contracts mul+add into an FMA, so an EFT's `s = a + b` is no
# longer fl(a+b) and the lo word absorbs an f32-sized error. Verified HLO:
# `df_mul(x, x)`'s final add was fused with a RECOMPUTED x*x (bypassing the
# stored p1) -> 5e-8 relative error. `jax.lax.optimization_barrier` does
# not help (stripped before fusion), and no XLA flag disables the remat
# (tried xla_cpu_enable_fast_math=false, xla_allow_excess_precision=false).
# Consequences:
#   * Inside Pallas kernels (the production path) this hazard is absent:
#     Mosaic lowers the kernel body directly — XLA fusion/remat never sees
#     it, and ops carry fastmath<none>.
#   * Outside kernels under jit on CPU (interpret-mode tests), df64 chains
#     are accurate to ~1e-7 relative worst-case instead of ~1e-14; tests
#     compare at that tolerance and the on-chip benches assert the real
#     kernel's parity.


def two_sum(a, b):
    """Error-free a + b: returns (s, err) with s = fl(a+b), s + err = a + b
    exactly (Knuth; no magnitude ordering assumed)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    """Dekker split: a = hi + lo with hi, lo each 12-bit significands."""
    t = _SPLITTER * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free a * b: (p, err) with p = fl(a*b), p + err = a*b exactly."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# df64 = (hi, lo) pairs
# ---------------------------------------------------------------------------


def df_from_f32(x):
    """Promote an exact f32 value to df64."""
    return x, jnp.zeros_like(x)


def df_neg(x):
    return -x[0], -x[1]


def df_add(x, y):
    """df64 + df64 (IEEE-style accurate version, ~2^-49 relative)."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def df_add_f32(x, b):
    """df64 + f32."""
    s1, s2 = two_sum(x[0], b)
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul(x, y):
    """df64 * df64."""
    p1, p2 = two_prod(x[0], y[0])
    p2 = p2 + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p1, p2)


def df_mul_f32(x, b):
    """df64 * f32."""
    p1, p2 = two_prod(x[0], b)
    p2 = p2 + x[1] * b
    return quick_two_sum(p1, p2)


def df_fma(x, y, acc):
    """acc + x * y in df64 (convenience for unrolled matmuls)."""
    return df_add(acc, df_mul(x, y))


def df_recip(y):
    """1 / y in df64: f32 seed + one df64 Newton step (r <- r + r*(1 - y r)),
    giving ~full double-float precision for normal inputs."""
    q0 = 1.0 / y[0]
    r = (q0, jnp.zeros_like(q0))
    # e = 1 - y * r  (df64)
    e = df_add_f32(df_neg(df_mul(y, r)), 1.0)
    return df_add(r, df_mul(r, e))


def df_div(x, y):
    return df_mul(x, df_recip(y))


def df_sqrt(x):
    """sqrt in df64: f32 seed + one Newton step y <- y + (x - y^2)/(2y)."""
    y0 = jnp.sqrt(x[0])
    y = (y0, jnp.zeros_like(y0))
    diff = df_sub(x, df_mul(y, y))
    half_inv = df_mul_f32(df_recip(y), 0.5)
    return df_add(y, df_mul(diff, half_inv))


# ---------------------------------------------------------------------------
# f64 <-> df64 boundary helpers (XLA side, outside kernels)
# ---------------------------------------------------------------------------


def split_f64(x):
    """f64 array -> (hi, lo) f32 pair with hi + lo == x to f32-pair accuracy
    (hi = round(x), lo = round(x - hi)). Call OUTSIDE Pallas kernels."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def merge_f64(hi, lo):
    """(hi, lo) f32 pair -> f64 array. Call OUTSIDE Pallas kernels."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
