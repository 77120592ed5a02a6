"""Structured-slab distribution (parallel/slab_hydro.py) vs the conforming
single-program solve: device-count invariance of full driver trajectories,
all steppers, sources, and the memoized stage-1 qdata path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.parallel.slab_hydro import SlabHydro


def _hydro(dim=3, refine=1, **kw):
    n = (2,) * dim
    m = fmesh.cartesian(dim, n, (1.0,) * dim)
    for _ in range(refine):
        m = fmesh.uniform_refine(m)
    # jacobi on both sides: the slab CG preconditions with the PA
    # diagonal, and the iteration-parity assertion below compares like
    # with like (the kron default would solve the single-device side in
    # ~1 iteration)
    opt = dict(problem=1, blast_energy=2.0, ode_solver=4, cg_tol=1e-12,
               precond="jacobi")
    opt.update(kw)
    return Hydro(m, Options(**opt))


def _run_pair(h, D, max_steps=8, t_final=0.6):
    sh = SlabHydro(h, n_devices=D)
    r1 = driver.run(h, t_final=t_final, max_steps=max_steps, verbose=False)
    r2 = driver.run(sh, t_final=t_final, max_steps=max_steps, verbose=False)
    return r1, r2, sh


def test_slab_matches_conforming_3d_sedov():
    h = _hydro()
    r1, r2, sh = _run_pair(h, 4)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-13
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    e1 = r1.energy_final
    assert abs(e1 - r2.energy_final) / abs(e1) < 1e-11
    # CG iteration counts agree up to psum-ordering roundoff (the
    # reference's Allreduce has the same rank-count sensitivity)
    assert abs(r1.h1_iters - r2.h1_iters) <= 0.01 * r1.h1_iters


def test_slab_state_transfer_roundtrip():
    h = _hydro()
    sh = SlabHydro(h, n_devices=4)
    G = sh.to_global(sh.S0)
    for k in ("x", "v"):
        assert np.allclose(G[k], np.asarray(h.S0[k]), atol=0)
    assert np.allclose(G["e"], np.asarray(h.S0["e"]), atol=0)


def test_slab_rk2avg_energy_conservation():
    h = _hydro(dim=2, refine=2, ode_solver=7)
    sh = SlabHydro(h, n_devices=4)
    r = driver.run(sh, t_final=0.6, max_steps=10, verbose=False)
    drift = abs(r.energy_final - r.energy_init) / abs(r.energy_init)
    assert drift < 1e-11


def test_slab_taylor_green_source():
    h = _hydro(dim=2, refine=2, problem=0, blast_energy=1.0)
    r1, r2, _ = _run_pair(h, 2, max_steps=6, t_final=0.75)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11


def test_slab_rt_gravity_source():
    h = _hydro(dim=2, refine=2, problem=7)
    r1, r2, _ = _run_pair(h, 2, max_steps=6, t_final=4.0)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11


def test_slab_rejects_bad_partition():
    h = _hydro()  # 4x4x4 elements
    with pytest.raises(ValueError):
        SlabHydro(h, n_devices=3)
