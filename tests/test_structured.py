"""Parity-decomposed structured E<->L transforms (ops/structured.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.fem import space as fspace
from laghos_tpu.ops import mass as mop
from laghos_tpu.ops.structured import (detect_structure, e_to_l_struct,
                                       l_to_e_struct)


@pytest.mark.parametrize("d,n,p", [
    (1, (5,), 2), (2, (3, 2), 2), (2, (4, 4), 1), (3, (2, 3, 2), 2),
    (3, (3, 3, 3), 3), (3, (2, 2, 2), 4),
])
def test_struct_matches_generic(d, n, p):
    rng = np.random.default_rng(0)
    m = fmesh.cartesian(d, n, tuple(1.0 for _ in range(d)))
    sp = fspace.build_h1_space(m, p)
    sm = detect_structure(m, sp.gather, p)
    assert sm is not None
    g = jnp.asarray(sp.gather)
    u = jnp.asarray(rng.normal(size=(2, sp.ndof)))
    assert jnp.array_equal(mop.l_to_e(u, g), l_to_e_struct(u, sm))
    ve = jnp.asarray(rng.normal(size=(2, m.num_elems, (p + 1) ** d)))
    ref = mop.e_to_l(ve, g, sp.ndof)
    got = e_to_l_struct(ve, sm)
    assert float(jnp.abs(ref - got).max()) < 1e-13


def test_struct_rejects_unstructured():
    m = fmesh.load_netgen_2d(
        "/root/reference/data/square01_quad_unstr.mesh")
    sp = fspace.build_h1_space(m, 2)
    assert detect_structure(m, sp.gather, 2) is None


def test_struct_rejects_shifted_rt_mesh_ok():
    # rt2D is cartesian after shift: detection should still work (it is a
    # uniform lattice) and round-trip correctly
    from laghos_tpu.data import get_mesh

    m = get_mesh("rt2D")
    sp = fspace.build_h1_space(m, 2)
    sm = detect_structure(m, sp.gather, 2)
    if sm is not None:
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.normal(size=(1, sp.ndof)))
        assert jnp.array_equal(mop.l_to_e(u, jnp.asarray(sp.gather)),
                               l_to_e_struct(u, sm))


@pytest.mark.slow
def test_hydro_trajectory_struct_vs_generic():
    """Short 3D Sedov trajectory: structured vs generic paths agree."""
    from laghos_tpu.driver import run
    from laghos_tpu.hydro import Hydro, Options

    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    res = {}
    for name, flag in (("struct", True), ("generic", False)):
        h = Hydro(m, Options(problem=1, blast_energy=0.25,
                             structured_el=flag))
        assert (h._sm is not None) == flag
        r = run(h, t_final=0.02, max_steps=-1)
        # canonical element order (struct mode reorders mesh elements)
        cent = h.mesh.verts[h.mesh.corners_lattice()].mean(axis=1)
        order = np.lexsort(cent.T)
        res[name] = (r.steps, np.asarray(r.S["e"])[order])
    assert res["struct"][0] == res["generic"][0]
    # struct mode contracts in a different (lattice) order, so the two
    # trajectories diverge by reassociation roundoff compounded over
    # ~60 steps; |e| ~ 15 here, so 1e-9 is ~6e-11 relative.
    assert np.abs(res["struct"][1] - res["generic"][1]).max() < 1e-9
