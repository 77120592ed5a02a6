"""Generic owned-dof halo layout (parallel/halo.py).

The production multi-chip mode is the structured-slab path
(parallel/slab_hydro.py, tests/test_slab.py); halo.py keeps the generic
dof-ownership layout machinery that an unstructured-mesh halo build
would use."""

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
