"""Benchmark: particles-mutated/s/chip on the SMC stage superstep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's linear-model test — 9 params, 400
particles, n_phi=120, 1 MH step — takes ~3 minutes on a 2-core CI runner
(reference test/smc.jl:24), i.e. 400*119/180s ~= 264 particle-mutations/s.
Our metric is the same unit measured on the jitted stage superstep
(correction + selection + weighted moments + blocked-RWMH mutation with the
batched likelihood) at production particle count, post-compile.

The whole benchmark is exactly TWO XLA programs (one init, one superstep) —
compiles on this machine go through a remote service, so program count is
kept minimal.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
try:
    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

BASELINE_MUTATIONS_PER_S = 400 * 119 / 180.0  # reference CI wall-clock
N_PARTS = 32768
N_STAGES = 30


def main():
    from smc_tpu.params import ParamSpace
    from smc_tpu.models.linear import (linear_parameters, make_linear_loglike,
                                       generate_linear_data)
    from smc_tpu.smc import make_superstep

    data, X = generate_linear_data(seed=1793)
    space = ParamSpace(linear_parameters())
    ll = make_linear_loglike(X)
    loglike_batched = jax.vmap(lambda th: ll(th, data))

    superstep = make_superstep(
        space, loglike_batched, n_blocks=3, n_mh_steps=1, alpha=0.9,
        resampling_method="systematic", threshold=0.5 * N_PARTS)

    @jax.jit
    def init(key):
        draws = space.sample_prior(key, N_PARTS)
        loglh = loglike_batched(draws)
        loglh = jnp.where(jnp.isnan(loglh), -jnp.inf, loglh)
        logprior = space.log_prior(draws)
        return draws, loglh, logprior

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    t0 = time.perf_counter()
    params, loglh, logprior = init(k0)
    jax.block_until_ready(params)
    t_init = time.perf_counter() - t0

    old_loglh = jnp.zeros(N_PARTS, jnp.float64)
    weights = jnp.ones(N_PARTS, jnp.float64)

    # Warm up / compile the superstep.
    t0 = time.perf_counter()
    out = superstep(key, params, loglh, logprior, old_loglh, weights,
                    jnp.float64(0.05), jnp.float64(0.0), jnp.float64(0.5))
    jax.block_until_ready(out[0])
    t_compile = time.perf_counter() - t0

    # Timed: chain real stages (state feeds forward, fresh key each stage).
    state = (params, loglh, logprior, old_loglh, weights)
    t0 = time.perf_counter()
    for s in range(N_STAGES):
        key, sk = jax.random.split(key)
        pn = 0.05 + 0.9 * (s + 1) / N_STAGES
        pn1 = 0.05 + 0.9 * s / N_STAGES
        out = superstep(sk, *state, jnp.float64(pn), jnp.float64(pn1),
                        jnp.float64(0.5))
        state = out[:5]
    jax.block_until_ready(state[0])
    dt = time.perf_counter() - t0

    mutations_per_s = N_PARTS * N_STAGES / dt
    n_chips = max(len(jax.devices()), 1)
    value = mutations_per_s / n_chips
    print(json.dumps({
        "metric": "particles_mutated_per_s_per_chip",
        "value": round(value, 1),
        "unit": "particle-mutations/s/chip",
        "vs_baseline": round(value / BASELINE_MUTATIONS_PER_S, 2),
    }))
    # Context lines on stderr so the JSON line stays clean.
    import sys
    print(f"# n_parts={N_PARTS} stages={N_STAGES} stage_time={dt/N_STAGES*1e3:.1f}ms "
          f"init={t_init:.1f}s compile={t_compile:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
