"""Misc helpers.

The reference's util.jl also defines Complex comparison overloads (<, min,
max comparing real parts, src/util.jl:187-231) to support models whose
solvers return complex eigenvalues; in JAX the analogue is sorting/comparing
by the real part explicitly, provided here as `real_sort_key`.
"""

from __future__ import annotations

import jax.numpy as jnp


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def real_sort_key(x):
    """Comparison key for possibly-complex arrays: the real part (reference
    src/util.jl:187-231 semantics)."""
    return jnp.real(x)


def scrub_loglh(loglh):
    """Map ANY non-finite log-likelihood (nan, +inf, -inf stays) to -inf.

    The reference's try/catch->-Inf discipline (src/initialization.jl:46-54,
    src/mutation.jl:112-121) has no +inf channel only because Julia throws
    there; a user likelihood that returns +inf in JAX would otherwise be
    accepted with probability 1 in mutation and detonate the next correction
    step (exp(dphi * +inf) -> inf weights -> NaN ESS)."""
    return jnp.where(jnp.isfinite(loglh), loglh, -jnp.inf)
