"""Resampling kernels (reference src/resample.jl).

All three reference methods, as global device kernels:

  * systematic (default): one shared uniform offset, spoke thresholds
    (i-1+u)/N, sequential-scan-over-sorted-thresholds in the reference
    (src/resample.jl:45-71) — here a prefix sum + vectorized binary search
    (jnp.cumsum + searchsorted), the parallel formulation of the same map.
  * multinomial: N iid uniforms against the cumulative weights
    (src/resample.jl:26-44) — a batched searchsorted.
  * polyalgo: the reference delegates to StatsBase.sample's alias-table
    polyalgorithm (src/resample.jl:73-75), which is *distributionally*
    multinomial; on TPU the batched searchsorted is already the fast path, so
    :polyalgo is an alias for an independent multinomial draw.

Under a sharded cloud, cumsum lowers to a cross-shard scan and the row
gather to collective gathers — no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

VALID_METHODS = ("systematic", "multinomial", "polyalgo", "stratified",
                 "metropolis")


@partial(jax.jit, static_argnames=("method", "n_parts"))
def resample(key, weights, method: str = "systematic", n_parts: int | None = None):
    """Resampled ancestor indices for `weights` (need not be normalized).

    Matches reference semantics: returned index i is the first j with
    cumweights[j] > threshold (strict), i.e. searchsorted side='right'.

    Args:
      key: PRNG key (the reference uses the global RNG; an explicit key keeps
        multi-host runs bit-identical, SURVEY.md §2.8).
      weights: f64[N] particle weights.
      method: "systematic" | "multinomial" | "polyalgo".
      n_parts: number of indices to draw (defaults to len(weights); the
        bridge-distribution path draws fewer, reference src/smc_main.jl:262-270).
    """
    if method not in VALID_METHODS:
        raise ValueError(
            f"Invalid resampler {method!r}. Options are 'systematic', "
            "'multinomial', or 'polyalgo' (plus the extensions 'stratified' "
            "and 'metropolis')")
    n_out = int(n_parts) if n_parts is not None else weights.shape[0]

    if method == "metropolis":
        return _metropolis(key, weights, n_out)

    w = weights / jnp.sum(weights)
    cw = jnp.cumsum(w)

    if method == "systematic":
        u = jax.random.uniform(key, (), dtype=jnp.float64)
        thresholds = (jnp.arange(n_out, dtype=jnp.float64) + u) / n_out
        idx = jnp.searchsorted(cw, thresholds, side="right")
    elif method == "stratified":
        # one iid uniform per stratum [(i-1)/N, i/N) — between systematic's
        # single offset and multinomial's full independence
        u = jax.random.uniform(key, (n_out,), dtype=jnp.float64)
        thresholds = (jnp.arange(n_out, dtype=jnp.float64) + u) / n_out
        idx = jnp.searchsorted(cw, thresholds, side="right")
    else:  # multinomial / polyalgo
        u = jax.random.uniform(key, (n_out,), dtype=jnp.float64)
        idx = jnp.searchsorted(cw, u, side="right")

    # cw[-1] can be < 1 by rounding; clamp like the reference's scan that
    # never returns an out-of-range index for u inside [0, 1).
    return jnp.clip(idx, 0, weights.shape[0] - 1)


def _metropolis(key, weights, n_out, n_iter: int = 32):
    """Metropolis resampler (Murray, Lee & Jacob, arXiv:1202.6163; see
    PAPERS.md): each output slot runs a short Metropolis chain over ancestor
    indices with acceptance w_k / w_j — no cumulative sum, no sort, just
    uniform index draws and gathers. O(1/n_iter) bias, fully local in
    structure: the natural choice when the global prefix-sum of the standard
    resamplers becomes the bottleneck on a very large sharded cloud."""
    n = weights.shape[0]
    kp, ku = jax.random.split(key)
    props = jax.random.randint(kp, (n_iter, n_out), 0, n)
    us = jax.random.uniform(ku, (n_iter, n_out), dtype=jnp.float64)

    def body(j, pu):
        prop, u = pu
        accept = u * weights[j] < weights[prop]
        return jnp.where(accept, prop, j), None

    init = jnp.arange(n_out) % n
    j, _ = jax.lax.scan(body, init, (props, us))
    return j
