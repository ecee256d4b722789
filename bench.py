"""Benchmark: particles-mutated/s/chip on the SMC stage superstep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's linear-model test — 9 params, 400
particles, n_phi=120, 1 MH step — takes ~3 minutes on a 2-core CI runner
(reference test/smc.jl:24), i.e. 400*119/180s ~= 264 particle-mutations/s.
Our metric is the same unit measured on the jitted stage superstep
(correction + selection + weighted moments + blocked-RWMH mutation with the
batched likelihood) at production particle count, post-compile.
"""

import json
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

BASELINE_MUTATIONS_PER_S = 400 * 119 / 180.0  # reference CI wall-clock


def main():
    import __graft_entry__

    n_parts = 32768
    superstep, args = __graft_entry__._build(n_parts=n_parts, seed=0)
    (skey, params, loglh, logprior, old_loglh, weights, phi_n, phi_n1, c) = args

    # Warm up / compile.
    out = superstep(*args)
    jax.block_until_ready(out)

    # Timed: chain real stages (state feeds forward, fresh key each stage).
    n_stages = 30
    key = jax.random.PRNGKey(123)
    state = (params, loglh, logprior, old_loglh, weights)
    phi_pairs = [(0.05 + 0.9 * (s + 1) / n_stages,
                  0.05 + 0.9 * s / n_stages) for s in range(n_stages)]
    t0 = time.perf_counter()
    for s in range(n_stages):
        key, sk = jax.random.split(key)
        pn, pn1 = phi_pairs[s]
        out = superstep(sk, *state, np.float64(pn), np.float64(pn1), c)
        state = out[:5]
    jax.block_until_ready(state[0])
    dt = time.perf_counter() - t0

    mutations_per_s = n_parts * n_stages / dt
    n_chips = max(len(jax.devices()), 1)
    value = mutations_per_s / n_chips
    print(json.dumps({
        "metric": "particles_mutated_per_s_per_chip",
        "value": round(value, 1),
        "unit": "particle-mutations/s/chip",
        "vs_baseline": round(value / BASELINE_MUTATIONS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
