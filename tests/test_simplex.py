"""Triangle (simplex) discretization gates."""

import numpy as np
import pytest

from laghos_tpu.fem import simplex as fsx
from laghos_tpu.fem import simplex_mesh as fsm
from laghos_tpu.hydro import Options


def test_tri_quadrature_exact():
    X, Y, W = fsx.tri_quadrature(6)
    assert np.isclose(W.sum(), 0.5, atol=1e-14)     # triangle area
    # exact moments: int x^a y^b = a! b! / (a+b+2)!
    from math import factorial

    for a in range(4):
        for b in range(4 - a):
            exact = (factorial(a) * factorial(b)
                     / factorial(a + b + 2))
            got = (W * X**a * Y**b).sum()
            assert np.isclose(got, exact, atol=1e-14), (a, b)


def test_tri_basis_partition_of_unity():
    t = fsx.h1_tri_tables(3, 7)
    assert np.allclose(t["B"].sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(t["Gx"].sum(axis=1), 0.0, atol=1e-10)
    l = fsx.l2_tri_tables(2, 7)
    assert np.allclose(l["B"].sum(axis=1), 1.0, atol=1e-12)


def test_tri_mesh_load_refine():
    m = fsm.load_tri_mesh("/root/reference/data/square01_tri.mesh")
    assert m.num_elems > 0
    assert np.isclose(m.element_volumes().sum(), 1.0, atol=1e-12)
    r = fsm.uniform_refine_tri(m)
    assert r.num_elems == 4 * m.num_elems
    assert np.isclose(r.element_volumes().sum(), 1.0, atol=1e-12)


def test_tri_h1_dofs():
    m = fsm.load_tri_mesh("/root/reference/data/square01_tri.mesh")
    NE, nv = m.num_elems, m.verts.shape[0]
    sp = fsm.build_tri_h1(m, 2)
    # P2: verts + edges; Euler: E = (3*NE + NB)/2
    nb = m.bdr_verts.shape[0]
    nedges = (3 * NE + nb) // 2
    assert sp["ndof"] == nv + nedges
    # linear field reproduced by nodal interpolation -> continuity implied
    assert sp["gather"].max() == sp["ndof"] - 1


def test_tri_hydro_static_and_sod():
    from laghos_tpu.simplex_hydro import TriHydro

    m = fsm.load_tri_mesh("/root/reference/data/square01_tri.mesh")
    # static triple point: uniform p, nothing moves
    h3 = TriHydro(m, Options(problem=3, cg_tol=1e-12))
    S, t, steps = h3.run(t_final=0.3, max_steps=8)
    e0 = np.asarray(h3.S0["e"])
    e1 = np.asarray(S["e"])
    assert np.allclose(e0, e1, atol=1e-9)
    assert float(np.abs(np.asarray(S["v"])).max()) < 1e-9

    # Sod on triangles: runs stably, energy roughly conserved
    h2 = TriHydro(m, Options(problem=2, cg_tol=1e-12))
    S, t, steps = h2.run(t_final=0.1, max_steps=40)
    assert np.all(np.isfinite(np.asarray(S["e"])))
    assert steps > 3
