"""shard_map halo distribution vs the single-program conforming solve."""

import jax
import numpy as np
import pytest

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.parallel import halo


def _hydro3d():
    m = fmesh.cartesian(3, (2, 2, 4), (1.0, 1.0, 1.0))
    return Hydro(m, Options(problem=1, blast_energy=2.0, cg_tol=1e-12))


def test_layout_partitions():
    h = _hydro3d()
    lay = halo.build_layout(h.h1, 4)
    # every global dof owned exactly once
    counts = np.zeros(h.ndof)
    for k in range(4):
        dofs = lay.loc_of_glob[k]
        counts[dofs] += lay.owned[k, :dofs.size]
    assert np.all(counts == 1.0)
    # scatter/gather roundtrip
    rng = np.random.default_rng(0)
    u = rng.normal(size=(3, h.ndof))
    ul = halo.scatter_global(lay, u)
    back = halo.gather_global(lay, ul, h.ndof)
    np.testing.assert_allclose(back, u)


def test_halo_advance_matches_conforming():
    from laghos_tpu.parallel.halo_hydro import HaloHydro

    h = _hydro3d()
    hh = HaloHydro(h, n_devices=4)
    dt = float(h.dt_estimate(h.S0))

    S1, est1, _, _ = h.advance(h.S0, dt)
    S2, est2 = hh.advance(hh.S0, dt)
    assert np.isclose(float(est1), float(est2), rtol=1e-10)

    e1 = float(np.sqrt((np.asarray(S1["e"]) ** 2).sum()))
    e2 = hh.e_norm(S2)
    assert np.isclose(e1, e2, rtol=1e-11)

    # velocity comparison on the global dofs
    v2 = halo.gather_global(hh.layout, np.asarray(S2["v"]), h.ndof)
    np.testing.assert_allclose(np.asarray(S1["v"]), v2, atol=1e-10)


def test_halo_multi_step():
    from laghos_tpu.parallel.halo_hydro import HaloHydro

    h = _hydro3d()
    hh = HaloHydro(h, n_devices=4)
    from laghos_tpu import driver

    res = driver.run(h, t_final=0.6, max_steps=4, vis_steps=1)
    S, t, steps = hh.run(0.6, max_steps=4)
    assert steps == res.steps
    assert np.isclose(res.e_norm, hh.e_norm(S), rtol=1e-11)
