"""Correction step: incremental weights and effective sample size.

Reference math:
  * incremental weights, three bridging variants — src/smc_main.jl:400-410
  * compute_ESS — src/helpers.jl:173-181

Everything here is a pure function of f64 arrays; under a sharded mesh the
sums become psum collectives automatically.

Numerical-stability upgrade over the reference: the reference exponentiates
`(phi_n - phi_n1) * loglh` raw (src/smc_main.jl:401-410) and NaN-ESS-aborts
whenever a coarse schedule meets a peaked likelihood (|loglh| in the
thousands makes every incremental weight underflow to 0, so the normalized
weights are 0/0). Here the *chain-facing* quantities — normalized weights,
ESS, and the log-MDD increment — are computed in log space relative to the
cloud maximum of `log(weight) + log(inc)`, which is invariant to any common
shift of the log incremental weights. Only the *reported* incremental-weight
column (the reference's saved `w` matrix) is the raw exponential, for
artifact parity; it may underflow cosmetically in extreme configs while the
estimation itself stays finite.
"""

from __future__ import annotations

import jax.numpy as jnp


def log_incremental_weights(loglh, old_loglh, phi_n, phi_n1,
                            tempered_update_prior_weight: float = 0.0,
                            log_prob_old_data: float = 0.0):
    """log w_tilde per particle (reference src/smc_main.jl:401-410, in logs).

    Three variants keyed on the *static* bridge prior weight omega:
      omega == 0: (phi_{n-1}-phi_n) old_loglh + (phi_n-phi_{n-1}) loglh
      omega == 1: (phi_n-phi_{n-1}) loglh
      0<omega<1:  the convex bridge — the old-posterior term is mixed with
                  prior mass omega, normalized by the old data's log-MDD;
                  the inner mixture is a logaddexp, so no intermediate
                  exponential can overflow.
    """
    d = phi_n - phi_n1
    if tempered_update_prior_weight == 0.0:
        return -d * old_loglh + d * loglh
    elif tempered_update_prior_weight == 1.0:
        return d * loglh
    else:
        w = tempered_update_prior_weight
        mix = jnp.logaddexp(old_loglh - log_prob_old_data + jnp.log1p(-w),
                            jnp.log(w))
        return -d * mix + d * loglh


def incremental_weights(loglh, old_loglh, phi_n, phi_n1,
                        tempered_update_prior_weight: float = 0.0,
                        log_prob_old_data: float = 0.0):
    """w_tilde per particle (reference src/smc_main.jl:401-410). Raw
    exponential — may under/overflow for extreme Delta-phi * loglh; the
    driver uses `correct` below for the stable chain-facing quantities."""
    return jnp.exp(log_incremental_weights(
        loglh, old_loglh, phi_n, phi_n1, tempered_update_prior_weight,
        log_prob_old_data))


def correct(loglh, old_loglh, weights, phi_n, phi_n1,
            tempered_update_prior_weight: float = 0.0,
            log_prob_old_data: float = 0.0):
    """The full correction step, numerically stable.

    Returns (inc_w, norm_w, ess, mdd_inc):
      inc_w:   raw incremental weights exp(log w_tilde) — the reference's
               saved `w` column (src/smc_main.jl:413-420); cosmetic-only.
      norm_w:  new weights normalized to sum to N (src/particle.jl:362-369),
               computed shift-invariantly so uniform underflow cannot zero
               the cloud.
      ess:     N^2 / sum(norm_w^2) (src/smc_main.jl:427).
      mdd_inc: log( (1/N) sum_i weight_i * w_tilde_i ) — the stage's
               log-MDD increment (src/smc_main.jl:419, summed in logs).

    ESS is NaN only when the cloud is *genuinely* degenerate (every particle
    has zero weight or -inf loglh), which is what check_nan_ess should fire
    on — not on a representable-but-small common scale.
    """
    n = loglh.shape[0]
    log_inc = log_incremental_weights(
        loglh, old_loglh, phi_n, phi_n1, tempered_update_prior_weight,
        log_prob_old_data)
    lw = jnp.log(weights) + log_inc       # log unnormalized new weights
    m = jnp.max(lw)                       # -inf only if ALL lw are -inf
    shifted = jnp.exp(lw - m)             # max entry is exactly 1.0
    total = jnp.sum(shifted)
    norm_w = n * shifted / total
    ess = n * n / jnp.sum(norm_w * norm_w)
    mdd_inc = m + jnp.log(total / n)
    inc_w = jnp.exp(log_inc)
    return inc_w, norm_w, ess, mdd_inc


def normalize_to_n(weights):
    """Normalize weights to sum to N (reference src/particle.jl:362-369)."""
    n = weights.shape[0]
    return n * weights / jnp.sum(weights)


def ess_from_normalized(norm_weights):
    """ESS = N^2 / sum(W_i^2) for weights normalized to sum to N
    (reference src/smc_main.jl:427)."""
    n = norm_weights.shape[0]
    return n * n / jnp.sum(norm_weights * norm_weights)


def compute_ess(loglh, current_weights, phi_n, phi_n1, old_loglh=None):
    """ESS after a hypothetical tempering step phi_n1 -> phi_n
    (reference compute_ESS, src/helpers.jl:173-181). Hot function inside the
    adaptive-phi bisection; one fused elementwise pass + two reductions,
    max-shifted in log space so huge |loglh| cannot underflow the weights
    (the shift cancels exactly in the normalized weights)."""
    if old_loglh is None:
        old_loglh = jnp.zeros_like(loglh)
    n = loglh.shape[0]
    log_inc = (phi_n1 - phi_n) * old_loglh + (phi_n - phi_n1) * loglh
    lw = jnp.log(current_weights) + log_inc
    shifted = jnp.exp(lw - jnp.max(lw))
    norm_w = n * shifted / jnp.sum(shifted)
    return n * n / jnp.sum(norm_w * norm_w)
