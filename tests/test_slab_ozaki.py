"""Distributed f64 production mode (Ozaki + IR through the halo paths).

Round-3 verdict gap: the int8-MXU Ozaki lattice chains and the
mixed-precision IR velocity solve — the kernels behind the north-star
FOM — only existed on the conforming single-device path.  These gates
assert that SlabHydro (plane halos) and ChunkHydro (unstructured SFC
chunks) run the SAME f64-accurate kernels per device and reproduce the
conforming ozaki trajectory to round-off, mirroring the reference where
the MPI path runs identical per-rank kernels
(laghos_solver.cpp:362-398).
"""

import numpy as np
import pytest

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.parallel.chunk_hydro import ChunkHydro
from laghos_tpu.parallel.slab_hydro import SlabHydro


def _hydro_oz(**kw):
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    opt = dict(problem=1, blast_energy=2.0, ode_solver=4, cg_tol=1e-12,
               precond="jacobi", ozaki=True)
    opt.update(kw)
    return Hydro(m, Options(**opt))


def test_slab_ozaki_wiring():
    """Structural: the distributed view carries the per-block Ozaki
    build + f32 shadow, and the dt estimate (through the oz qupdate
    chains) matches the conforming one."""
    h = _hydro_oz()
    assert h._lat_oz is not None and h.opt.cg_ir
    sh = SlabHydro(h, n_devices=4)
    assert sh.lat_oz is not None
    assert sh.lat_TB32 is not None
    dt1 = float(h.dt_estimate(h.S0))
    dt2 = float(sh.dt_estimate(sh.S0))
    assert abs(dt1 - dt2) / dt1 < 1e-12


def test_pencil_ozaki_wiring():
    """The f64 production kernels are partition-shape-agnostic: a
    2-axis (pencil) device mesh carries the same per-block Ozaki build
    and reproduces the conforming dt estimate (reference counterpart:
    the MPI path is partition-agnostic, laghos_solver.cpp:362-398)."""
    h = _hydro_oz()
    sp = SlabHydro(h, mesh_shape=(2, 2))
    assert sp.lat_oz is not None
    dt1 = float(h.dt_estimate(h.S0))
    dt2 = float(sp.dt_estimate(sp.S0))
    assert abs(dt1 - dt2) / dt1 < 1e-12


@pytest.mark.slow
def test_pencil_ozaki_ir_matches_conforming():
    """Full-trajectory invariance of ozaki+IR over a pencil mesh."""
    h = _hydro_oz()
    sp = SlabHydro(h, mesh_shape=(2, 2))
    r1 = driver.run(h, t_final=0.6, max_steps=8, verbose=False)
    r2 = driver.run(sp, t_final=0.6, max_steps=8, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-13
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    assert (abs(r1.energy_final - r2.energy_final)
            / abs(r1.energy_final) < 1e-11)


@pytest.mark.slow
def test_slab_ozaki_ir_matches_conforming():
    """Full-trajectory device-count invariance of the ozaki+IR mode:
    slab (4 devices) == conforming to ~1e-12."""
    h = _hydro_oz()
    sh = SlabHydro(h, n_devices=4)
    r1 = driver.run(h, t_final=0.6, max_steps=8, verbose=False)
    r2 = driver.run(sh, t_final=0.6, max_steps=8, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-13
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    e1 = r1.energy_final
    assert abs(e1 - r2.energy_final) / abs(e1) < 1e-11


@pytest.mark.slow
def test_slab_ozaki_rk2avg_conservation():
    """The north-star configuration (ozaki + RK2Avg) through the slab
    path conserves total energy to round-off."""
    h = _hydro_oz(ode_solver=7, cg_tol=1e-11)
    sh = SlabHydro(h, n_devices=2)
    r = driver.run(sh, t_final=0.6, max_steps=10, verbose=False)
    drift = abs(r.energy_final - r.energy_init) / abs(r.energy_init)
    assert drift < 1e-11


@pytest.mark.slow
def test_chunk_ozaki_matches_conforming():
    """E-form Ozaki contractions through the unstructured chunk path
    (h.oz wiring): 3-device trajectory == conforming."""
    from laghos_tpu.parallel.partition import sfc_partition

    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    opt = Options(problem=1, blast_energy=2.0, ode_solver=4,
                  cg_tol=1e-12, precond="jacobi", ozaki=True,
                  structured_el=False, lattice_ops=False)
    h = Hydro(m, opt)
    assert h.oz is not None and h._lat_oz is None
    ch = ChunkHydro(h, n_devices=3)
    r1 = driver.run(h, t_final=0.6, max_steps=6, verbose=False)
    r2 = driver.run(ch, t_final=0.6, max_steps=6, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
