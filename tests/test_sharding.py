"""Sharded execution over the 8-virtual-device CPU mesh: the multi-chip
program must compile, run, and agree with the single-device program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smc_tpu import smc
from smc_tpu.parallel.mesh import particle_mesh, particle_sharding
from smc_tpu.models.linear import (linear_parameters, make_linear_loglike,
                                   generate_linear_data)

TRUE = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 1.0, 3.0, 3.0, 1.0])


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_smc_on_mesh_matches_accuracy_gate():
    data, X = generate_linear_data(seed=1793)
    ll = make_linear_loglike(X)
    mesh = particle_mesh()
    res = smc(ll, linear_parameters(), data,
              n_parts=5000, n_phi=120, lam=2.1, alpha=0.9,
              resampling_method="polyalgo", verbose="none", seed=42,
              mesh=mesh)
    mu = res.posterior_mean()
    assert np.max(np.abs(mu - TRUE)) < 0.5
    # cloud stayed sharded over the particle axis
    assert not res.cloud.params.sharding.is_fully_replicated


def test_sharded_matches_unsharded():
    """Same seed, with and without the mesh: equal results up to
    reduction-order float error (the SPMD program is semantically the
    single-device program; cross-shard psums reassociate sums)."""
    data, X = generate_linear_data(seed=1793)
    ll = make_linear_loglike(X)
    kw = dict(n_parts=64, n_phi=25, lam=2.0, verbose="none", seed=5)
    r1 = smc(ll, linear_parameters(), data, **kw)
    r2 = smc(ll, linear_parameters(), data, mesh=particle_mesh(), **kw)
    np.testing.assert_allclose(np.asarray(r1.cloud.params),
                               np.asarray(r2.cloud.params), rtol=1e-7)
    np.testing.assert_allclose(r1.log_mdd, r2.log_mdd, rtol=1e-7)


def test_indivisible_n_parts_raises():
    data, X = generate_linear_data(seed=1793)
    ll = make_linear_loglike(X)
    with pytest.raises(ValueError, match="divisible"):
        smc(ll, linear_parameters(), data, n_parts=401, n_phi=10,
            mesh=particle_mesh(), verbose="none")


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
