"""The SMC driver: correction → selection → mutation over a tempering
schedule (reference smc(), src/smc_main.jl:118-527).

TPU-native architecture (SURVEY.md §7): the stage loop runs on the host
(stage count is data-dependent and small), but each stage body is ONE jitted
superstep — incremental weights, normalization, ESS, the resample decision
(`lax`-style dataflow select of resampled vs. identity indices), weighted
mean/cov (a single MXU matmul), block permutation, and the full blocked-RWMH
mutation with the user's batched likelihood. The only per-stage host↔device
traffic is a handful of scalars (phi, ESS, acceptance) and — optionally —
the stage's weight columns for the w/W matrices.

Under a `jax.sharding.Mesh` the same program runs SPMD: reductions become
psums, the resampling gather becomes collective gathers, and every host
computes bit-identical phi/resampling decisions because the PRNG key is
shared (replacing the reference's master/worker Distributed.jl asymmetry,
SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from smc_tpu.cloud import Cloud
from smc_tpu.params import ParamSpace
from smc_tpu.ops.correction import incremental_weights
from smc_tpu.ops.schedule import fixed_schedule, solve_adaptive_phi
from smc_tpu.ops.resample import resample as resample_indices, VALID_METHODS
from smc_tpu.ops.mutation import make_mutation_step
from smc_tpu.ops.initialization import (initial_draw, initialize_likelihoods)
from smc_tpu import io as smc_io
from smc_tpu import diagnostics as diag


@dataclasses.dataclass
class SMCResult:
    """Estimation output. The reference returns nothing and writes to disk
    (src/smc_main.jl:513-527, consumed via get_cloud); we return the state
    directly and also write when save paths are given."""

    cloud: Cloud
    w: Optional[np.ndarray]       # incremental weights, [N, n_stages+1]
    W: Optional[np.ndarray]       # normalized weights,  [N, n_stages+1]
    log_mdd: float                # log marginal data density
    para_names: List[str]
    space: ParamSpace

    def posterior_mean(self):
        from smc_tpu.cloud import weighted_mean
        return np.asarray(weighted_mean(self.cloud))

    def posterior_std(self):
        from smc_tpu.cloud import weighted_std
        return np.asarray(weighted_std(self.cloud))


def marginal_data_density(w: np.ndarray, W: np.ndarray) -> float:
    """log-MDD from the saved weight matrices: sum_n log((1/N) sum_i
    W_{i,n-1} * w~_{i,n}). This is the quantity the reference saves w/W for
    (SURVEY.md §0; src/smc_main.jl:354-367, 419-420)."""
    n = w.shape[0]
    out = 0.0
    for s in range(1, w.shape[1]):
        out += np.log(np.sum(W[:, s - 1] * w[:, s]) / n)
    return float(out)


def _logistic_c_update(c: float, accept: float, target: float) -> float:
    """Adaptive step-size rule (reference src/smc_main.jl:453-455):
    c <- c * (0.95 + 0.10 e^{16(a-t)} / (1 + e^{16(a-t)}))."""
    x = 16.0 * (accept - target)
    # numerically-stable logistic
    sig = 1.0 / (1.0 + np.exp(-x)) if x >= 0 else np.exp(x) / (1.0 + np.exp(x))
    return c * (0.95 + 0.10 * sig)


def make_superstep(space, loglike_batched, n_blocks, n_mh_steps, alpha,
                   resampling_method, threshold,
                   tempered_update_prior_weight=0.0, log_prob_old_data=0.0,
                   old_loglike_batched=None):
    """Build the jitted per-stage superstep: correction → selection →
    weighted moments → blocked-RWMH mutation, as ONE XLA program
    (reference stage body, src/smc_main.jl:396-484).

    Returned signature:
      superstep(key, params, loglh, logprior, old_loglh, weights,
                phi_n, phi_n1, c)
        -> (params, loglh, logprior, old_loglh, weights, accept,
            inc_w, W_col, ess, did_resample, accept_mean, mdd_inc)

    The resample decision is dataflow (a select between resampled and
    identity indices), so the program is trace-once regardless of ESS.
    """
    mutation_step = make_mutation_step(
        space, loglike_batched, n_blocks, n_mh_steps, alpha,
        old_loglike_batched)
    free_inds = jnp.asarray(space.free_inds)
    n_free = space.n_free
    omega = tempered_update_prior_weight

    @jax.jit
    def superstep(skey, params, loglh, logprior, old_loglh, weights,
                  phi_n, phi_n1, c_scalar):
        n = params.shape[0]
        # -- Step 1: correction (src/smc_main.jl:400-420) --
        inc_w = incremental_weights(loglh, old_loglh, phi_n, phi_n1,
                                    omega, log_prob_old_data)
        mdd_inc = jnp.log(jnp.sum(weights * inc_w) / n)
        new_w = weights * inc_w
        norm_w = n * new_w / jnp.sum(new_w)
        # -- Step 2: selection (src/smc_main.jl:426-446) --
        ess = n * n / jnp.sum(norm_w * norm_w)
        do_resample = ess < threshold
        kr, kp, km = jax.random.split(skey, 3)
        res_idx = resample_indices(kr, norm_w, method=resampling_method)
        idx = jnp.where(do_resample, res_idx, jnp.arange(n))
        params = jnp.take(params, idx, axis=0)
        loglh = jnp.take(loglh, idx)
        logprior = jnp.take(logprior, idx)
        old_loglh = jnp.take(old_loglh, idx)
        weights_out = jnp.where(do_resample, jnp.ones_like(norm_w), norm_w)
        # -- Step 3: mutation (src/smc_main.jl:448-484) --
        vals_free = params[:, free_inds]
        wsum = jnp.sum(weights_out)
        mu = (weights_out @ vals_free) / wsum
        dev = vals_free - mu
        cov = (dev.T * weights_out) @ dev / wsum
        cov = 0.5 * (cov + cov.T)  # symmetrize (src/smc_main.jl:462)
        perm = jax.random.permutation(kp, n_free)
        params, loglh, logprior, old_loglh, accept = mutation_step(
            km, params, loglh, logprior, old_loglh, mu, cov, perm,
            c_scalar, phi_n, phi_n1)
        accept_mean = jnp.mean(accept)
        W_col = weights_out
        return (params, loglh, logprior, old_loglh, weights_out, accept,
                inc_w, W_col, ess, do_resample, accept_mean, mdd_inc)

    return superstep


def smc(loglikelihood: Callable,
        parameters,
        data=None,
        *,
        verbose: str = "low",
        n_parts: int = 5_000,
        n_blocks: int = 1,
        n_mh_steps: int = 1,
        lam: float = 2.1,
        n_phi: int = 300,
        resampling_method: str = "systematic",
        threshold_ratio: float = 0.5,
        c: float = 0.5,
        alpha: float = 1.0,
        target: float = 0.25,
        use_fixed_schedule: bool = True,
        tempering_target: float = 0.97,
        old_data=None,
        old_cloud: Optional[Cloud] = None,
        old_loglikelihood: Optional[Callable] = None,
        tempered_update_prior_weight: float = 0.0,
        log_prob_old_data: float = 0.0,
        regime_switching: bool = False,
        run_test: bool = False,
        loadpath: str = "",
        savepath: Optional[str] = None,
        particle_store_path: Optional[str] = None,
        save_intermediate: bool = False,
        intermediate_stage_increment: int = 10,
        continue_intermediate: bool = False,
        store_weight_matrices: bool = True,
        batched: bool = False,
        seed: int = 0,
        key=None,
        mesh=None,
        run_csminwel: bool = False,
        debug_assertion: bool = False,
        profile_dir: Optional[str] = None,
        # --- accepted for kwarg-surface parity with the reference
        #     (src/smc_main.jl:118-161); see docstring ---
        parallel: Optional[bool] = None,
        testing: bool = False,
        data_vintage: Optional[str] = None,
        old_vintage: str = "",
        smc_iteration: int = 1,
        filestring_addl=(),
        intermediate_stage_start: int = 0) -> SMCResult:
    """Estimate p(theta|Y) by adaptive-tempered SMC.

    Mirrors the reference's kwarg surface (src/smc_main.jl:118-161) with
    these deliberate differences:
      * `loglikelihood(theta, data) -> scalar` is a pure JAX function of a
        flat f64[P] vector (regime columns appended per ParamSpace); pass
        `batched=True` if it already maps f64[N, P] -> f64[N] (e.g. a
        hand-tuned Pallas kernel). It must be *total*: return -inf/nan on
        failure instead of raising (SURVEY.md §7 "hard parts").
      * `parameters` is a list[Parameter] or a ParamSpace.
      * `parallel` is gone: the program is always data-parallel over
        particles; pass `mesh` (a 1-D jax.sharding.Mesh with axis "parts")
        to shard the cloud across devices/hosts.
      * results are returned (SMCResult) and only written to disk when
        `savepath`/`particle_store_path` are given.
      * `seed`/`key` control an explicit threaded PRNG; checkpoints are
        bit-reproducible on resume.
      * `lam`/`alpha`/`n_phi` are the reference's λ/α/n_Φ.

    `run_csminwel` is accepted for parity but, like the reference at this
    version (SURVEY.md §2.7 note), posterior-mode polish is not run.

    Parity-only kwargs: `parallel` (always data-parallel here; pass `mesh`
    to span devices), `testing` (suppresses final disk writes, reference
    src/smc_main.jl:513), `data_vintage`/`old_vintage`/`smc_iteration`/
    `filestring_addl` (file-naming conventions the reference's Settings
    layer uses; our savepath is explicit), `intermediate_stage_start`
    (resume stage is read from the checkpoint itself).

    `profile_dir` writes a jax.profiler trace of the whole recursion for
    TensorBoard/XProf — the upgrade over the reference's wall-clock-only
    timing (SURVEY.md §5 "Tracing/profiling").
    """
    del parallel, data_vintage, old_vintage, smc_iteration, filestring_addl
    del intermediate_stage_start
    if resampling_method not in VALID_METHODS:
        raise ValueError(f"resampling_method must be one of {VALID_METHODS}")
    if not (0.0 <= tempered_update_prior_weight <= 1.0):
        raise ValueError(
            "The keyword tempered_update_prior_weight must be within [0, 1] "
            f"but is currently set to {tempered_update_prior_weight}")
    if run_csminwel:
        warnings.warn("run_csminwel is accepted for API parity but mode "
                      "polish is not implemented (matching the reference)")

    space = (parameters if isinstance(parameters, ParamSpace)
             else ParamSpace(parameters, regime_switching=regime_switching))
    if space.n_free == 0:
        raise ValueError("All model parameters are fixed!")

    # ---- batched likelihood(s) -------------------------------------------
    if batched:
        loglike_batched = lambda th: loglikelihood(th, data)
    else:
        loglike_batched = jax.vmap(lambda th: loglikelihood(th, data))

    tempered_update = old_data is not None
    old_ll_fn = old_loglikelihood if old_loglikelihood is not None else loglikelihood
    if tempered_update:
        if batched:
            old_loglike_batched = lambda th: old_ll_fn(th, old_data)
        else:
            old_loglike_batched = jax.vmap(lambda th: old_ll_fn(th, old_data))
    else:
        old_loglike_batched = None

    # ---- sharding ---------------------------------------------------------
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        if n_parts % int(np.prod(mesh.devices.shape)) != 0:
            raise ValueError("n_parts must be divisible by the mesh size")
        sharding = NamedSharding(mesh, P(axis))

    # ---- PRNG -------------------------------------------------------------
    if key is None:
        key = jax.random.PRNGKey(seed)

    threshold = threshold_ratio * n_parts
    sched = fixed_schedule(n_phi, lam)  # ((n-1)/(n_phi-1))^lam, src/smc_main.jl:349
    sched_dev = jnp.asarray(sched)

    # ---- initialization: 4 ways (reference src/smc_main.jl:244-345) -------
    i = 1
    j = 1          # 0-based index of next untried schedule entry (ref j=2, 1-based)
    phi_prop = 0.0
    log_mdd = 0.0
    resampled_last_period = False
    w_cols: List[np.ndarray] = []
    W_cols: List[np.ndarray] = []

    def _reinit_scalars(cloud, tempered):
        """initialize_cloud_settings! (reference src/initialization.jl:196-211)."""
        cloud.ESS = [cloud.ESS[-1]] if tempered else [float(n_parts)]
        cloud.stage_index = 1
        cloud.n_phi = n_phi
        cloud.resamples = 0
        cloud.c = c
        cloud.accept_rate = target
        cloud.total_sampling_time = 0.0
        cloud.tempering_schedule = [0.0]
        return cloud

    if tempered_update:
        if old_cloud is None or old_cloud.is_empty():
            if not loadpath:
                raise ValueError("tempered update requires old_cloud or loadpath")
            old_cloud = smc_io.get_cloud(loadpath)
        cloud = old_cloud
        old_n_parts = cloud.n_parts

        if tempered_update_prior_weight == 0.0 and old_n_parts == n_parts:
            cloud = _reinit_scalars(cloud, tempered=True)
            cloud = initialize_likelihoods(cloud, space, loglike_batched)
        else:
            # Bridge distribution (reference src/smc_main.jl:260-329):
            # (1-omega) N resampled old-posterior draws + omega N prior draws
            # whose loglh is evaluated on the OLD data, then everything
            # re-evaluated on the new data.
            omega = tempered_update_prior_weight
            n_to_resample = int(round((1.0 - omega) * n_parts))
            n_from_prior = n_parts - n_to_resample

            parts_list, loglh_list, logprior_list, oldll_list = [], [], [], []
            if n_to_resample > 0:
                key, kb = jax.random.split(key)
                idx = resample_indices(kb, cloud.weights,
                                       method=resampling_method,
                                       n_parts=n_to_resample)
                parts_list.append(jnp.take(cloud.params, idx, axis=0))
                loglh_list.append(jnp.take(cloud.loglh, idx))
                logprior_list.append(jnp.take(cloud.logprior, idx))
                oldll_list.append(jnp.take(cloud.old_loglh, idx))
            if n_from_prior > 0:
                key, kp = jax.random.split(key)
                prior_cloud = initial_draw(kp, space, old_loglike_batched,
                                           n_from_prior, sharding=None)
                parts_list.append(prior_cloud.params)
                loglh_list.append(prior_cloud.loglh)
                logprior_list.append(prior_cloud.logprior)
                oldll_list.append(prior_cloud.old_loglh)

            cloud = Cloud.create(space.n_para, n_parts, sharding=sharding)
            cloud.params = jnp.concatenate(parts_list, axis=0)
            cloud.loglh = jnp.concatenate(loglh_list)
            cloud.logprior = jnp.concatenate(logprior_list)
            cloud.old_loglh = jnp.concatenate(oldll_list)

            cloud = initialize_likelihoods(cloud, space, loglike_batched)
            cloud.zero_bad_loglh_weights()      # src/smc_main.jl:314
            norm_w = cloud.normalize_weights()
            key, kr = jax.random.split(key)
            idx = resample_indices(kr, norm_w, method=resampling_method)
            cloud = cloud.reindexed(idx)
            cloud.reset_weights()
            cloud.ESS.append(float(n_parts))     # src/smc_main.jl:325
            cloud = _reinit_scalars(cloud, tempered=True)
    elif continue_intermediate:
        if not loadpath:
            raise ValueError("continue_intermediate requires loadpath")
        (cloud, w_saved, W_saved, j, phi_prop, log_mdd,
         saved_key) = smc_io.load_checkpoint(loadpath)
        if saved_key is not None:
            key = jnp.asarray(saved_key)
        w_cols = [w_saved[:, k] for k in range(w_saved.shape[1])]
        W_cols = [W_saved[:, k] for k in range(W_saved.shape[1])]
        i = cloud.stage_index
        c = cloud.c
        if use_fixed_schedule:
            cloud.tempering_schedule = list(sched[:i])
        phi_prop = float(sched[min(j, n_phi - 1)])
    else:
        key, k0 = jax.random.split(key)
        cloud = initial_draw(k0, space, loglike_batched, n_parts,
                             sharding=sharding)
        cloud = _reinit_scalars(cloud, tempered=False)

    if sharding is not None:
        cloud.params = jax.device_put(cloud.params, sharding)
        for f in ("loglh", "logprior", "old_loglh", "accept", "weights"):
            setattr(cloud, f, jax.device_put(getattr(cloud, f), sharding))

    cloud.n_phi = n_phi
    if use_fixed_schedule and not continue_intermediate:
        cloud.tempering_schedule = [float(sched[0])]

    # w/W matrices for log-MDD (reference src/smc_main.jl:354-367): first
    # column of w is zeros; first column of W is ones (fresh) or the carried
    # weights (tempered update).
    if store_weight_matrices and not continue_intermediate:
        w_cols = [np.zeros(n_parts)]
        W_cols = [np.asarray(cloud.weights) if tempered_update
                  else np.ones(n_parts)]

    # ---- the per-stage jitted superstep -----------------------------------
    superstep = make_superstep(
        space, loglike_batched, n_blocks, n_mh_steps, alpha,
        resampling_method, threshold, tempered_update_prior_weight,
        log_prob_old_data, old_loglike_batched)

    para_names = list(space.names)
    diag.init_stage_print(cloud, para_names, verbose=verbose,
                          use_fixed_schedule=use_fixed_schedule)
    diag.vprint(verbose, "low", "SMC recursion starts...")

    # ---- recursion (reference src/smc_main.jl:377-508) --------------------
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    phi_n = float(cloud.tempering_schedule[-1]) if continue_intermediate else 0.0
    timer = diag.StageTimer()
    while phi_n < 1.0:
        i += 1
        cloud.stage_index = i

        phi_n1 = float(cloud.tempering_schedule[-1])
        if use_fixed_schedule:
            phi_n = float(sched[i - 1])
        else:
            ess_bar = tempering_target * (
                float(n_parts) if resampled_last_period else cloud.ESS[-1])
            resampled_last_period = False
            phi_dev, j_dev, prop_dev = solve_adaptive_phi(
                cloud.loglh, cloud.weights, cloud.old_loglh,
                jnp.float64(phi_n1), sched_dev, jnp.int64(j),
                jnp.float64(phi_prop), jnp.float64(ess_bar))
            phi_n = float(phi_dev)
            j = int(j_dev)
            phi_prop = float(prop_dev)
        cloud.tempering_schedule.append(phi_n)

        # adaptive c BEFORE mutation, from last stage's acceptance
        # (src/smc_main.jl:453-455)
        c = _logistic_c_update(c, cloud.accept_rate, target)
        cloud.c = c

        key, skey = jax.random.split(key)
        (cloud.params, cloud.loglh, cloud.logprior, cloud.old_loglh,
         cloud.weights, cloud.accept, inc_w, W_col, ess, did_resample,
         accept_mean, mdd_inc) = superstep(
            skey, cloud.params, cloud.loglh, cloud.logprior,
            cloud.old_loglh, cloud.weights, jnp.float64(phi_n),
            jnp.float64(phi_n1), jnp.float64(c))

        ess_f = float(ess)
        cloud.ESS.append(ess_f)
        if np.isnan(ess_f):
            diag.check_nan_ess(cloud, i, np.asarray(inc_w),
                               np.asarray(W_col), savepath or "smc_cloud.npz",
                               debug_assertion)
        if bool(did_resample):
            cloud.resamples += 1
            resampled_last_period = True
        cloud.accept_rate = float(accept_mean)
        log_mdd += float(mdd_inc)

        if store_weight_matrices:
            w_cols.append(np.asarray(inc_w))
            W_cols.append(np.asarray(W_col))

        dt = timer.lap()
        cloud.total_sampling_time += dt
        diag.end_stage_print(cloud, para_names, verbose=verbose,
                             use_fixed_schedule=use_fixed_schedule,
                             stage_time=dt)

        if run_test and i == 3:  # early break for tests (src/smc_main.jl:495-497)
            break

        if save_intermediate and savepath and \
                cloud.stage_index % intermediate_stage_increment == 0:
            wm = np.stack(w_cols, axis=1) if w_cols else np.zeros((n_parts, 0))
            Wm = np.stack(W_cols, axis=1) if W_cols else np.zeros((n_parts, 0))
            smc_io.save_checkpoint(savepath, cloud.stage_index, cloud, wm, Wm,
                                   j, phi_prop, log_mdd, key)

    if profile_dir:
        cloud.block_until_ready()
        jax.profiler.stop_trace()

    # ---- final artifacts (reference src/smc_main.jl:513-526) --------------
    w_matrix = np.stack(w_cols, axis=1) if store_weight_matrices else None
    W_matrix = np.stack(W_cols, axis=1) if store_weight_matrices else None
    if savepath and not testing:
        extra = {}
        if store_weight_matrices:
            extra = {"w": w_matrix, "W": W_matrix}
        extra["log_mdd"] = np.asarray(log_mdd)
        smc_io.save_cloud(savepath, cloud, extra=extra)
    if particle_store_path and not testing:
        smc_io.save_particle_store(particle_store_path, cloud)

    return SMCResult(cloud=cloud, w=w_matrix, W=W_matrix, log_mdd=log_mdd,
                     para_names=para_names, space=space)
