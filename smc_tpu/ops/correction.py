"""Correction step: incremental weights and effective sample size.

Reference math:
  * incremental weights, three bridging variants — src/smc_main.jl:400-410
  * compute_ESS — src/helpers.jl:173-181

Everything here is a pure function of f64 arrays; under a sharded mesh the
sums become psum collectives automatically.
"""

from __future__ import annotations

import jax.numpy as jnp


def incremental_weights(loglh, old_loglh, phi_n, phi_n1,
                        tempered_update_prior_weight: float = 0.0,
                        log_prob_old_data: float = 0.0):
    """w_tilde per particle (reference src/smc_main.jl:401-410).

    Three variants keyed on the *static* bridge prior weight omega:
      omega == 0: exp[(phi_{n-1}-phi_n) old_loglh + (phi_n-phi_{n-1}) loglh]
      omega == 1: exp[(phi_n-phi_{n-1}) loglh]
      0<omega<1:  the convex bridge — the old-posterior term is mixed with
                  prior mass omega, normalized by the old data's log-MDD.
    """
    d = phi_n - phi_n1
    if tempered_update_prior_weight == 0.0:
        return jnp.exp(-d * old_loglh + d * loglh)
    elif tempered_update_prior_weight == 1.0:
        return jnp.exp(d * loglh)
    else:
        w = tempered_update_prior_weight
        mix = jnp.log(jnp.exp(old_loglh - log_prob_old_data + jnp.log1p(-w)) + w)
        return jnp.exp(-d * mix + d * loglh)


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
    adaptive-phi bisection; one fused elementwise pass + two reductions."""
    if old_loglh is None:
        old_loglh = jnp.zeros_like(loglh)
    n = loglh.shape[0]
    inc = jnp.exp((phi_n1 - phi_n) * old_loglh + (phi_n - phi_n1) * loglh)
    new_w = current_weights * inc
    norm_w = n * new_w / jnp.sum(new_w)
    return n * n / jnp.sum(norm_w * norm_w)
