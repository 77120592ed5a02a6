"""Distributed on-device segment loop (parallel/segment.py): the
device-resident accept/reject/grow dt control flow must reproduce the
host loop's trajectory exactly, for slab, pencil, and chunk modes."""

import pytest
import numpy as np

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.parallel.chunk_hydro import ChunkHydro
from laghos_tpu.parallel.partition import sfc_partition
from laghos_tpu.parallel.slab_hydro import SlabHydro


def _hydro(dim=3, refine=1, **kw):
    m = fmesh.cartesian(dim, (2,) * dim, (1.0,) * dim)
    for _ in range(refine):
        m = fmesh.uniform_refine(m)
    opt = dict(problem=1, blast_energy=2.0, ode_solver=4, cg_tol=1e-12)
    opt.update(kw)
    return Hydro(m, Options(**opt))


def _cmp(run_h, max_steps=8, t_final=0.6):
    r1 = driver.run(run_h, t_final=t_final, max_steps=max_steps,
                    verbose=False)
    r2 = driver.run(run_h, t_final=t_final, max_steps=max_steps,
                    verbose=False, device_loop=True)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-14
    assert r1.h1_iters == r2.h1_iters
    assert abs(r1.e_norm - r2.e_norm) <= 1e-12 * r1.e_norm


def test_slab_device_loop_matches_host_loop():
    _cmp(SlabHydro(_hydro(), n_devices=4))


@pytest.mark.slow
def test_pencil_device_loop_matches_host_loop():
    _cmp(SlabHydro(_hydro(), mesh_shape=(2, 2)))


@pytest.mark.slow
def test_chunk_device_loop_matches_host_loop():
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=4,
                         cg_tol=1e-12, structured_el=False,
                         lattice_ops=False))
    _cmp(ChunkHydro(h, n_devices=4), max_steps=6)


@pytest.mark.slow
def test_slab_device_loop_rk2avg():
    _cmp(SlabHydro(_hydro(ode_solver=7), n_devices=4), max_steps=6)
