"""Pallas fused DSGE kernels on the real chip: parity + timing.

Round-4 headline measurement: the df64 VMEM-resident kernels
(ops/pallas_dsge.py) vs the XLA batch-last path on the same draws, one
v5e. Asserts the kernel's parity on hardware (the interpret-mode CPU tests
can only check at ~1e-7 because XLA-CPU fusion remat breaks EFTs —
ops/df64.py module note; the real kernel does not pass through XLA fusion)
and times RE solve / Kalman scan / full likelihood / full superstep.

Usage: python benchmarks/bench_as_pallas.py [n_parts]
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
    rec = {"metric": "as_pallas", "item": item, "ms": round(ms * 1e3, 3),
           "n_parts": n, "device": str(jax.devices()[0]), **kw}
    if compile_s is not None:
        rec["compile_s"] = round(compile_s, 1)
    print(json.dumps(rec), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    model = an_schorfheide()
    data = generate_as_data(T=80, seed=1793)
    space = ParamSpace(an_schorfheide_parameters())
    key = jax.random.PRNGKey(0)
    thetas = space.sample_prior(key, n)

    A, B, C, D = jax.vmap(model.system_fn)(thetas)
    Q = jax.vmap(model.shock_cov_fn)(thetas)
    d_obs, Z, H = jax.vmap(model.measurement_fn)(thetas)
    bl = lambda x: jnp.moveaxis(x, 0, -1)
    Ab, Bb, Cb, Db = bl(A), bl(B), bl(C), bl(D)
    Qb, Zb, Hb = bl(Q), bl(Z), bl(H)
    db = jnp.moveaxis(d_obs, 0, -1)
    data_dev = jnp.asarray(data)
    jax.block_until_ready(Ab)

    from smc_tpu.ops.pallas_dsge import (pallas_solve_linear_re,
                                         pallas_kalman_chandrasekhar)
    from smc_tpu.models.dsge import (bl_solve_linear_re,
                                     bl_kalman_loglike_chandrasekhar)

    # ---- RE solve: pallas vs XLA ------------------------------------------
    re_p = jax.jit(lambda a, b, c, d: pallas_solve_linear_re(a, b, c, d))
    best, tc = timeit(re_p, Ab, Bb, Cb, Db)
    emit("re_solve_pallas", best, n, tc)

    re_x = jax.jit(lambda a, b, c, d: bl_solve_linear_re(a, b, c, d))
    best_x, tcx = timeit(re_x, Ab, Bb, Cb, Db)
    emit("re_solve_xla", best_x, n, tcx)

    Xp, Mp, okp = re_p(Ab, Bb, Cb, Db)
    Xx, Mx, okx = re_x(Ab, Bb, Cb, Db)
    okp_, okx_ = np.asarray(okp), np.asarray(okx)
    agree = float(np.mean(okp_ == okx_))
    both = okp_ & okx_
    xerr = float(np.max(np.abs(np.asarray(Xp)[..., both]
                               - np.asarray(Xx)[..., both])))
    emit("re_parity", 0.0, n, ok_agree=round(agree, 5),
         max_abs_X_err=xerr, n_ok=int(both.sum()))

    # ---- Kalman scan: pallas vs XLA ---------------------------------------
    kf_p = jax.jit(lambda *a: pallas_kalman_chandrasekhar(*a))
    best, tc = timeit(kf_p, Xx, Mx, Qb, Zb, db, Hb, data_dev)
    emit("kalman_pallas", best, n, tc)

    kf_x = jax.jit(lambda *a: bl_kalman_loglike_chandrasekhar(*a))
    best_x, tcx = timeit(kf_x, Xx, Mx, Qb, Zb, db, Hb, data_dev)
    emit("kalman_xla", best_x, n, tcx)

    ll_p = np.asarray(kf_p(Xx, Mx, Qb, Zb, db, Hb, data_dev))
    ll_x = np.asarray(kf_x(Xx, Mx, Qb, Zb, db, Hb, data_dev))
    finite = np.isfinite(ll_p) & np.isfinite(ll_x)
    # Parity by posterior relevance band (measured round 4, 16k draws):
    # lanes within 50 nats of the max — the ones carrying all posterior
    # weight — agree to ~4e-13 relative; the error grows only deep in the
    # rejected tail (ll ~ -1e3..-1e11 below max, weight exactly 0), where
    # quasi-divergent filter states make ANY two arithmetics produce
    # different garbage.
    mx = np.max(ll_x[finite])
    bands = {}
    for band in (50.0, 1e4):
        m = finite & (ll_x > mx - band)
        bands[f"max_rel_within_{int(band)}_nats"] = (
            float(np.max(np.abs(ll_p[m] - ll_x[m]) / np.abs(ll_x[m])))
            if m.any() else np.nan)
        bands[f"n_within_{int(band)}_nats"] = int(m.sum())
    emit("kalman_parity", 0.0, n,
         finite_agree=round(float(np.mean(np.isfinite(ll_p)
                                          == np.isfinite(ll_x))), 5),
         n_finite=int(finite.sum()), **bands)

    # ---- full likelihood + superstep with the pallas backend --------------
    model_p = an_schorfheide(likelihood_backend="pallas")
    llb_p = jax.jit(lambda th: model_p.loglike_batched(th, data))
    best, tc = timeit(llb_p, thetas)
    emit("likelihood_full_pallas", best, n, tc)

    loglh = llb_p(thetas)
    logprior = space.log_prior(thetas)
    ss = make_superstep(space, llb_p, 1, 1, 0.9, "systematic", 0.5 * n)
    best, tc = timeit(ss, key, thetas, loglh, logprior,
                      jnp.zeros(n, jnp.float64), jnp.ones(n, jnp.float64),
                      jnp.float64(0.1), jnp.float64(0.05), jnp.float64(0.5))
    emit("full_superstep_pallas", best, n, tc)

    # ---- shard_map mesh bridge, REAL Mosaic compile (1-device mesh) -------
    # The multi-shard structure runs on the 8-virtual-CPU mesh in
    # tests/dryrun; HERE the full AS kernel goes through the same shard_map
    # path compiled by Mosaic on hardware, asserting it matches the
    # unsharded pallas backend bit-for-bit (round-4 VERDICT ask #5).
    from smc_tpu.parallel.mesh import particle_mesh, particle_sharding
    mesh1 = particle_mesh(jax.devices()[:1])
    model_pm = an_schorfheide(likelihood_backend="pallas", mesh=mesh1)
    thetas_sh = jax.device_put(thetas, particle_sharding(mesh1))
    llb_pm = jax.jit(lambda th: model_pm.loglike_batched(th, data))
    best, tc = timeit(llb_pm, thetas_sh)
    ll_mesh = np.asarray(llb_pm(thetas_sh))
    ll_flat = np.asarray(llb_p(thetas))
    bit_equal = bool(np.array_equal(ll_mesh, ll_flat))
    emit("likelihood_pallas_shard_map", best, n, tc,
         bit_equal_to_unsharded=bit_equal)
    assert bit_equal, "shard_map pallas likelihood != unsharded pallas"


if __name__ == "__main__":
    main()
