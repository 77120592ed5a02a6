"""Unstructured SFC-chunk distribution (parallel/chunk_hydro.py) vs the
conforming single-program solve.

The slab/pencil halo needs a raster lattice; this path covers
unstructured quad/hex meshes with owned-dof local L-vectors and a
boundary-dof psum exchange — device-count invariance of full driver
trajectories is the acceptance bar, like tests/test_slab.py."""

import numpy as np
import pytest

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.parallel.chunk_hydro import ChunkHydro
from laghos_tpu.parallel.partition import sfc_partition

DATA = "/root/reference/data"


def _hydro_unstr(refine=2, **kw):
    m = fmesh.load_netgen_2d(f"{DATA}/square01_quad_unstr.mesh")
    for _ in range(refine):
        m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    opt = dict(problem=1, blast_energy=0.25, ode_solver=4, cg_tol=1e-12,
               structured_el=False)
    opt.update(kw)
    return Hydro(m, Options(**opt))


def test_chunk_matches_conforming_unstr_2d():
    h = _hydro_unstr()
    ch = ChunkHydro(h, n_devices=4)
    r1 = driver.run(h, t_final=0.8, max_steps=8, verbose=False)
    r2 = driver.run(ch, t_final=0.8, max_steps=8, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-13
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    e1 = r1.energy_final
    assert abs(e1 - r2.energy_final) / abs(e1) < 1e-11
    assert abs(r1.h1_iters - r2.h1_iters) <= 0.01 * max(r1.h1_iters, 1)


def test_chunk_ragged_padding():
    """NE not divisible by D: phantom elements must not perturb the
    trajectory or the energies."""
    h = _hydro_unstr(refine=1)
    assert h.NE % 5 != 0
    ch = ChunkHydro(h, n_devices=5)
    r1 = driver.run(h, t_final=0.8, max_steps=6, verbose=False)
    r2 = driver.run(ch, t_final=0.8, max_steps=6, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
    ie1, ke1 = (float(x) for x in h.energies(r1.S))
    ie2, ke2 = (float(x) for x in ch.energies(r2.S))
    assert abs(ie1 - ie2) / abs(ie1) < 1e-11
    assert abs(ke1 - ke2) / max(abs(ke1), 1e-30) < 1e-9


def test_chunk_state_transfer_roundtrip():
    h = _hydro_unstr(refine=1)
    ch = ChunkHydro(h, n_devices=3)
    G = ch.to_global(ch.S0)
    for k in ("x", "v"):
        assert np.allclose(G[k], np.asarray(h.S0[k]), atol=0)
    assert np.allclose(G["e"], np.asarray(h.S0["e"]), atol=0)


@pytest.mark.slow
def test_chunk_3d_sedov():
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=4,
                         cg_tol=1e-12, structured_el=False,
                         lattice_ops=False))
    ch = ChunkHydro(h, n_devices=4)
    r1 = driver.run(h, t_final=0.6, max_steps=6, verbose=False)
    r2 = driver.run(ch, t_final=0.6, max_steps=6, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11


def test_chunk_rt_gravity_source():
    m = fmesh.load_mfem_mesh(f"{DATA}/rt2D.mesh")
    m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    h = Hydro(m, Options(problem=7, cg_tol=1e-12, structured_el=False))
    ch = ChunkHydro(h, n_devices=4)
    r1 = driver.run(h, t_final=4.0, max_steps=5, verbose=False)
    r2 = driver.run(ch, t_final=4.0, max_steps=5, verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
