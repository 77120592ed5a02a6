"""Pencil (2-axis device mesh) distribution vs the conforming solve.

The slab halo (tests/test_slab.py) partitions one element axis; these
tests partition TWO (mesh_shape=(Dz, Dy)) and assert the same
device-layout invariance of full driver trajectories — the reference's
halo assembly is partition-shape agnostic (laghos_solver.cpp:362-398),
so ours must be too."""

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
    # jacobi on both sides for the iteration-parity assertions (the
    # kron default solves the single-device side in ~1 iteration)
    opt = dict(problem=1, blast_energy=2.0, ode_solver=4, cg_tol=1e-12,
               precond="jacobi")
    opt.update(kw)
    return Hydro(m, Options(**opt))


@pytest.mark.slow
def test_pencil_matches_conforming_3d_sedov():
    h = _hydro()  # 4x4x4 elements
    sh = SlabHydro(h, mesh_shape=(2, 4))
    r1 = driver.run(h, t_final=0.6, max_steps=8, verbose=False)
    r2 = driver.run(sh, t_final=0.6, max_steps=8, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-13
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    e1 = r1.energy_final
    assert abs(e1 - r2.energy_final) / abs(e1) < 1e-11
    assert abs(r1.h1_iters - r2.h1_iters) <= 0.01 * r1.h1_iters


@pytest.mark.slow
def test_pencil_matches_slab_3d():
    """(4,) slabs and (2, 2) pencils of the same mesh give the same
    trajectory (both equal the conforming one; corner/edge halo sums
    must be exact)."""
    h = _hydro()
    rs = driver.run(SlabHydro(h, n_devices=4), t_final=0.6, max_steps=6,
                    verbose=False)
    rp = driver.run(SlabHydro(h, mesh_shape=(2, 2)), t_final=0.6,
                    max_steps=6, verbose=False)
    assert rs.steps == rp.steps
    assert abs(rs.e_norm - rp.e_norm) / rs.e_norm < 1e-12


def test_pencil_state_transfer_roundtrip():
    h = _hydro()
    sh = SlabHydro(h, mesh_shape=(2, 4))
    G = sh.to_global(sh.S0)
    for k in ("x", "v"):
        assert np.allclose(G[k], np.asarray(h.S0[k]), atol=0)
    assert np.allclose(G["e"], np.asarray(h.S0["e"]), atol=0)


def test_pencil_2d_both_axes():
    """2D mesh fully partitioned over a (2, 2) device mesh."""
    h = _hydro(dim=2, refine=2)
    sh = SlabHydro(h, mesh_shape=(2, 2))
    r1 = driver.run(h, t_final=0.6, max_steps=6, verbose=False)
    r2 = driver.run(sh, t_final=0.6, max_steps=6, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11


def test_pencil_rk2avg_energy_conservation():
    h = _hydro(ode_solver=7)
    sh = SlabHydro(h, mesh_shape=(2, 2))
    r = driver.run(sh, t_final=0.6, max_steps=8, verbose=False)
    drift = abs(r.energy_final - r.energy_init) / abs(r.energy_init)
    assert drift < 1e-11


def test_pencil_rejects_bad_partition():
    h = _hydro()  # 4x4x4 elements
    with pytest.raises(ValueError):
        SlabHydro(h, mesh_shape=(2, 3))
