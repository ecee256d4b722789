"""An-Schorfheide DSGE on the real TPU chip: suspect bisection + full
estimation numbers (VERDICT round-2 missing #1 / next-step #2).

Round-2 context: the AS fused bench died with `UNAVAILABLE: TPU device
error` on the remote-TPU tunnel, even at fused_chunk_stages=8. Round-3
root-cause: the persistent compilation cache config hangs the axon client
inside the first compile RPC (see bench.py note) — this script never
enables it on TPU. It then:

  1. times each AS stage ingredient as its own jitted program (RE solve by
     cyclic reduction, Chandrasekhar Kalman scan, full likelihood, the
     blocked-RWMH mutation step, the full superstep) — the per-suspect
     ablation the round-2 verdict asked for;
  2. runs a COMPLETE AS estimation with the host-loop superstep (one
     dispatch per stage, each well under any tunnel deadline) and, if that
     succeeds, with the fused recursion at a small chunk size;
  3. prints one JSON line per result.

Usage: python benchmarks/bench_as_tpu.py [n_parts] [n_phi]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from smc_tpu.params import ParamSpace
from smc_tpu.models.as_dsge import (an_schorfheide, an_schorfheide_parameters,
                                    generate_as_data)
from smc_tpu.models.dsge import solve_linear_re, kalman_loglike_chandrasekhar
from smc_tpu.ops.mutation import make_mutation_step
from smc_tpu.smc import make_superstep


def timeit(fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, t_compile


def emit(item, ms, n, compile_s=None, **kw):
    rec = {"metric": "as_tpu", "item": item, "ms": round(ms * 1e3, 3),
           "n_parts": n, "device": str(jax.devices()[0]), **kw}
    if compile_s is not None:
        rec["compile_s"] = round(compile_s, 1)
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_phi = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    model = an_schorfheide()
    data = generate_as_data(T=80, seed=1793)
    space = ParamSpace(an_schorfheide_parameters())
    # batch-LAST likelihood (models/dsge.py bl_* kernels) — the TPU fast
    # path; pass BASELINE=1 to measure the old vmapped batch-first path
    if _os.environ.get("BASELINE"):
        llb = jax.vmap(lambda th: model.loglike(th, data))
    else:
        llb = lambda th: model.loglike_batched(th, data)

    key = jax.random.PRNGKey(0)
    params = space.sample_prior(key, n)
    jax.block_until_ready(params)

    # --- suspect 1: RE solve (cyclic reduction + GJ + spectral radii) ------
    from smc_tpu.models.dsge import (bl_solve_linear_re,
                                     bl_kalman_loglike_chandrasekhar)
    sysb = jax.vmap(model.system_fn)
    A, B, C, D = sysb(params)
    jax.block_until_ready(A)
    bl = lambda x: jnp.moveaxis(x, 0, -1)
    re_b = jax.jit(lambda a, b, c, d: bl_solve_linear_re(
        bl(a), bl(b), bl(c), bl(d)))
    best, tc = timeit(re_b, A, B, C, D)
    emit("re_solve_bl", best, n, tc)

    # --- suspect 2: Kalman (Chandrasekhar) scan alone, batch-last ----------
    X, M, ok = re_b(A, B, C, D)
    Q = jax.vmap(model.shock_cov_fn)(params)
    d_obs, Z, H = jax.vmap(model.measurement_fn)(params)
    data_dev = jnp.asarray(data)
    kf_b = jax.jit(lambda x, m, q, z, dd, h: bl_kalman_loglike_chandrasekhar(
        x, m, bl(q), bl(z), jnp.moveaxis(dd, 0, -1), bl(h), data_dev))
    best, tc = timeit(kf_b, X, M, Q, Z, d_obs, H)
    emit("kalman_chand_scan_bl", best, n, tc)

    # --- full likelihood ----------------------------------------------------
    llj = jax.jit(llb)
    best, tc = timeit(llj, params)
    emit("likelihood_full", best, n, tc)

    # --- mutation step (1 block, includes 1 likelihood pass) ---------------
    loglh = llj(params)
    logprior = space.log_prior(params)
    old_loglh = jnp.zeros(n, jnp.float64)
    weights = jnp.ones(n, jnp.float64)
    free = params[:, space.free_inds]
    mu = jnp.mean(free, axis=0)
    dev = free - mu
    cov = dev.T @ dev / n
    mstep = jax.jit(make_mutation_step(space, llb, 1, 1, 0.9))
    perm = jnp.arange(space.n_free)
    best, tc = timeit(mstep, key, params, loglh, logprior, old_loglh, mu,
                      cov, perm, jnp.float64(0.5), jnp.float64(0.1),
                      jnp.float64(0.05))
    emit("mutation_1block", best, n, tc)

    # --- full superstep -----------------------------------------------------
    ss = make_superstep(space, llb, 1, 1, 0.9, "systematic", 0.5 * n)
    best, tc = timeit(ss, key, params, loglh, logprior, old_loglh, weights,
                      jnp.float64(0.1), jnp.float64(0.05), jnp.float64(0.5))
    emit("full_superstep", best, n, tc)

    # --- complete estimation, host-loop driver (1 dispatch/stage) ----------
    from smc_tpu.ops.schedule import fixed_schedule
    from smc_tpu.ops.initialization import initial_draw
    from smc_tpu.smc import _logistic_c_update

    sched = fixed_schedule(n_phi, 2.0)
    key, k0 = jax.random.split(key)
    t0 = time.perf_counter()
    cloud_params = initial_draw(k0, space, llb, n)
    jax.block_until_ready(cloud_params.params)
    t_init = time.perf_counter() - t0

    def run_host(k, cl):
        p, l, lp, ol = cl.params, cl.loglh, cl.logprior, cl.old_loglh
        w = jnp.ones(n, jnp.float64)
        c, acc = 0.5, 0.25
        log_mdd = 0.0
        t0 = time.perf_counter()
        for i in range(1, n_phi):
            c = _logistic_c_update(c, acc, 0.25)
            k, sk = jax.random.split(k)
            (p, l, lp, ol, w, _, _, _, ess, did, acc_m, mdd_inc) = ss(
                sk, p, l, lp, ol, w, jnp.float64(sched[i]),
                jnp.float64(sched[i - 1]), jnp.float64(c))
            fetched = jax.device_get((ess, acc_m, mdd_inc))
            if np.isnan(fetched[0]):
                raise RuntimeError(f"NaN ESS at stage {i}")
            acc = float(fetched[1])
            log_mdd += float(fetched[2])
        return time.perf_counter() - t0, log_mdd

    wall, mdd = run_host(key, cloud_params)
    n_stages = n_phi - 1
    emit("host_loop_estimation", wall, n, None,
         n_stages=n_stages, log_mdd=round(mdd, 2),
         ms_per_stage=round(wall / n_stages * 1e3, 1),
         mutations_per_s=round(n * n_stages / wall, 1),
         init_s=round(t_init, 1))

    # --- fused recursion, small chunks -------------------------------------
    try:
        from smc_tpu.smc import make_fused_recursion
        for chunk in (4, 16):
            fused = make_fused_recursion(
                space, llb, 1, 1, 0.9, "systematic", 0.5 * n, n_phi, sched,
                True, 0.97, 0.25, store_weight_matrices=False,
                chunk_stages=chunk)
            k = jax.random.PRNGKey(7)
            arrays = (cloud_params.params, cloud_params.loglh,
                      cloud_params.logprior, cloud_params.old_loglh,
                      jnp.ones(n, jnp.float64))
            state = (0.5, 0.25, 0.0, float(n), 1, 0.0, False)
            s_global, phi, log_mdd = 0, 0.0, 0.0
            t0 = time.perf_counter()
            while phi < 1.0:
                st = fused(k, *arrays, *state, s_global)
                jax.block_until_ready(st["params"])
                if int(st["s"]) == s_global:
                    raise RuntimeError("no progress")
                s_global = int(st["s"])
                phi = float(st["phi"])
                log_mdd += float(st["log_mdd"])
                k = st["key"]
                arrays = (st["params"], st["loglh"], st["logprior"],
                          st["old_loglh"], st["weights"])
                state = (float(st["c"]), float(st["accept_rate"]), phi,
                         float(st["ess_prev"]), int(st["j"]),
                         float(st["phi_prop"]), bool(st["resampled_last"]))
            wall = time.perf_counter() - t0
            emit(f"fused_estimation_chunk{chunk}", wall, n,
                 n_stages=s_global, log_mdd=round(log_mdd, 2),
                 ms_per_stage=round(wall / s_global * 1e3, 1),
                 mutations_per_s=round(n * s_global / wall, 1))
    except Exception as e:
        print(f"# fused AS failed: {e!r}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
