"""Measure the per-dispatch floor and f64-emulation cost on the current
backend, to calibrate every other benchmark number (VERDICT round-2
next-step #3/#4: 'name the dominant term' in the ~24 ms stage time).

Times, best-of-N after warmup, each as ONE jitted program:
  * tiny f32 elementwise        -> pure dispatch floor
  * 32768x9 f64 elementwise     -> dispatch + f64 VPU emulation at cloud size
  * 32768 f64 reduction         -> dispatch + reduction
  * the same elementwise body iterated 32x inside lax.fori_loop
    -> device-side per-iteration cost with dispatch amortized: the
       difference (loop32 - single) / 31 is the true device time of one
       iteration, with ALL host/tunnel overhead removed.

Usage: python benchmarks/bench_dispatch_floor.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def emit(item, s, **kw):
    print(json.dumps({"metric": "dispatch_floor", "item": item,
                      "ms": round(s * 1e3, 4),
                      "device": str(jax.devices()[0]), **kw}), flush=True)


def main():
    xs = jnp.ones((8, 128), jnp.float32)
    xb = jnp.ones((32768, 9), jnp.float64)
    v = jnp.ones(32768, jnp.float64)

    f_tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    emit("tiny_f32_elementwise", timeit(f_tiny, xs))

    f_big = jax.jit(lambda x: x * 2.0 + 1.0)
    emit("cloud_f64_elementwise", timeit(f_big, xb))

    f_red = jax.jit(lambda x: jnp.sum(x * x))
    emit("cloud_f64_reduction", timeit(f_red, v))

    f_exp = jax.jit(lambda x: jnp.sum(jnp.exp(x - jnp.max(x))))
    emit("cloud_f64_exp_reduce", timeit(f_exp, v))

    def looped(body):
        def f(x):
            return jax.lax.fori_loop(0, 32, lambda i, a: body(a), x)
        return jax.jit(f)

    t1 = timeit(f_big, xb)
    t32 = timeit(looped(lambda x: x * 2.0 + 1.0), xb)
    emit("cloud_f64_elementwise_x32", t32,
         per_iter_device_ms=round((t32 - t1) / 31 * 1e3, 4))

    k = jax.random.PRNGKey(0)
    f_rng = jax.jit(lambda k: jax.random.normal(k, (32768, 9),
                                                dtype=jnp.float64))
    emit("rng_normal_32768x9_f64", timeit(f_rng, k))

    f_rng32 = jax.jit(lambda k: jax.random.normal(k, (32768, 9),
                                                  dtype=jnp.float32))
    emit("rng_normal_32768x9_f32", timeit(f_rng32, k))

    # cumsum + searchsorted: the systematic-resampling core
    f_cs = jax.jit(lambda w: jnp.searchsorted(
        jnp.cumsum(w), (jnp.arange(32768, dtype=jnp.float64) + 0.5)))
    emit("cumsum_searchsorted_f64", timeit(f_cs, v))

    # 9x9 f64 eigh (the mutation proposal factor)
    c = jnp.eye(9, dtype=jnp.float64)
    f_eigh = jax.jit(lambda m: jnp.linalg.eigh(m)[0])
    emit("eigh_9x9_f64", timeit(f_eigh, c))


if __name__ == "__main__":
    main()
