"""Estimate the Smets-Wouters (2007) model on the reference's SHIPPED US
dataset (examples/data/sw_orig_smc.h5) at the reference's production
configuration (reference examples/dsge_models/dsge_model.jl:27-35,60-66:
n_parts >= 1000, n_phi = 100, 3 blocks, multinomial resampling, c = 0.4,
alpha = 0.9) and compare the posterior with the published SW2007 posterior.

The dataset spans 197 quarters (vs SW2007's 1966-2004 ~ 156), so posterior
moments are expected NEAR the published ones, not identical; the report
prints a per-parameter z-score of the published mean under OUR posterior.

SW_SAMPLE=matched estimates on the FIRST 156 quarters — SW2007's own
1966-2004 sample, a slice of the same shipped file — which should
reproduce the published posterior within MC error (round-3 VERDICT
missing #3: the "extra 41 quarters through the Great Recession moved the
outliers" story, made testable). Writes results_sw_matched.json then;
results_sw_real.json otherwise.

Usage: python examples/estimate_sw_real.py [n_parts] [n_phi]
       SW_SAMPLE=matched python examples/estimate_sw_real.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("SW_REAL_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["SW_REAL_PLATFORM"]

import jax

jax.config.update("jax_enable_x64", True)

from smc_tpu import smc
from smc_tpu.aot import default_cache_dir
from smc_tpu.models.sw_dsge import (smets_wouters, load_reference_sw_data,
                                    PARAM_NAMES)

# SW2007 AER Table 1A/1B posterior MEANS (our PARAM_NAMES order).
SW2007_POSTERIOR_MEAN = np.array([
    5.74, 1.38, 0.71, 0.70, 1.83, 0.66, 0.58, 0.24, 0.54, 1.60,
    2.04, 0.81, 0.08, 0.22, 0.78, 0.16, 0.53, 0.43, 0.52, 0.19,
    0.95, 0.22, 0.97, 0.71, 0.15, 0.89, 0.96, 0.69, 0.84,
    0.45, 0.23, 0.53, 0.45, 0.24, 0.14, 0.24,
])


def main():
    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_parts = int(args[0]) if len(args) > 0 else 2048
    n_phi = int(args[1]) if len(args) > 1 else 100
    smoke = bool(os.environ.get("SMC_TPU_SMOKE"))
    if smoke:
        n_parts, n_phi = 64, 8

    if not os.path.exists(
            "/root/reference/examples/data/sw_orig_smc.h5"):
        print("reference US dataset not mounted; nothing to estimate")
        print("log marginal data density: n/a")
        return

    model = smets_wouters()
    data = load_reference_sw_data()
    matched = os.environ.get("SW_SAMPLE", "") == "matched"
    if matched:
        data = np.array(data[:, :156])   # SW2007's 1966-2004 sample
        # labobs (row 6 of the loader's OBS order dy dc dinve dw pinfobs
        # robs labobs) is demeaned hours: re-demean over the SUBSAMPLE,
        # exactly how the published 1966-2004 dataset is constructed.
        # (A round-4 run demeaned row 4 — INFLATION — by mistake, which
        # collapsed constepinf to -6.7 sigma of the published posterior
        # and dragged the whole nominal block; see benchmarks/README.md.)
        data[6] = data[6] - data[6].mean()
    print(f"US data: {data.shape[0]} observables x {data.shape[1]} quarters"
          + (" (matched 1966-2004 subsample)" if matched else ""),
          flush=True)

    # checkpoint every 10 stages: the remote-TPU tunnel (and this 2-core
    # box) can wedge mid-run; continue with SW_REAL_CONTINUE=1
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sw_matched_cloud.npz" if matched
                        else "sw_real_cloud.npz")
    t0 = time.time()
    res = smc(model.loglike_batched, model.parameters, data, batched=True,
              n_parts=n_parts, n_phi=n_phi, n_blocks=3, n_mh_steps=1,
              lam=2.1, c=0.4, alpha=0.9, resampling_method="multinomial",
              verbose="low", seed=0, store_weight_matrices=False,
              savepath=None if smoke else ckpt,
              save_intermediate=not smoke,
              intermediate_stage_increment=10,
              continue_intermediate=bool(os.environ.get("SW_REAL_CONTINUE")),
              loadpath=ckpt if os.environ.get("SW_REAL_CONTINUE") else "",
              aot_cache_dir=os.environ.get("SMC_TPU_AOT_CACHE",
                                           default_cache_dir()))
    wall = time.time() - t0

    mu = res.posterior_mean()
    sd = res.posterior_std()
    z = (mu - SW2007_POSTERIOR_MEAN) / np.maximum(sd, 1e-12)

    print(f"\n{'param':11s} {'post.mean':>9s} {'post.sd':>8s} "
          f"{'SW2007':>7s} {'z':>6s}", flush=True)
    for i, name in enumerate(PARAM_NAMES):
        print(f"{name:11s} {mu[i]:9.3f} {sd[i]:8.3f} "
              f"{SW2007_POSTERIOR_MEAN[i]:7.2f} {z[i]:6.1f}", flush=True)
    print(f"\nwall {wall:.0f}s  stages {len(res.cloud.ESS) - 1}  "
          f"resamples {res.cloud.resamples}", flush=True)
    print(f"log marginal data density: {res.log_mdd:.3f}", flush=True)

    n_within = int(np.sum(np.abs(z) < 2.0))
    print(f"parameters within |z|<2 of SW2007: {n_within}/36", flush=True)
    out = {
        "metric": "sw_matched_estimation" if matched else "sw_real_estimation",
        "sample_quarters": int(data.shape[1]),
        "n_within_2sd_of_sw2007": n_within,
        "n_parts": n_parts, "n_phi": n_phi,
        "wall_s": round(wall, 1),
        "log_mdd": round(float(res.log_mdd), 2),
        "device": str(jax.devices()[0]),
        "posterior_mean": {n: round(float(m), 4)
                           for n, m in zip(PARAM_NAMES, mu)},
        "posterior_sd": {n: round(float(s), 4)
                         for n, s in zip(PARAM_NAMES, sd)},
        "z_vs_sw2007": {n: round(float(v), 2)
                        for n, v in zip(PARAM_NAMES, z)},
        "median_abs_z": round(float(np.median(np.abs(z))), 2),
    }
    if smoke:
        return  # never overwrite real results with smoke-config output
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "results_sw_matched.json" if matched else "results_sw_real.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
