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


def _total_energy(h, S):
    """Discrete total energy: KE + IE with the hydro's own mass weights
    (massD = w * rho0(xq0) * detJ0, the Lagrangian-frame invariant mass),
    the quantity the scheme conserves semi-discretely
    (laghos_solver.cpp: ke+ie energy check)."""
    md = np.asarray(h.massD)
    g = np.asarray(h.gather)
    v = np.asarray(S["v"])                          # (dim, ndof)
    vq = np.einsum("qi,dei->deq", np.asarray(h.B), v[:, g])
    ke = 0.5 * (md * (vq**2).sum(axis=0)).sum()
    eq = np.einsum("qi,ei->eq", np.asarray(h.Bl), np.asarray(S["e"]))
    ie = (md * eq).sum()
    return ke + ie


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

    # Sod on triangles: runs stably, total energy conserved (the
    # semi-discrete KE<->IE transfer identity; RK4 drift only)
    h2 = TriHydro(m, Options(problem=2, cg_tol=1e-12))
    E0 = _total_energy(h2, h2.S0)
    S, t, steps = h2.run(t_final=0.1, max_steps=40)
    assert np.all(np.isfinite(np.asarray(S["e"])))
    assert steps > 3
    E1 = _total_energy(h2, S)
    assert abs(E1 - E0) / abs(E0) < 1e-6, (E0, E1)


# ---------------------------------------------------------------------------
# Tetrahedra (3D simplices) — the TETRAHEDRON geometry-switch entries.
# ---------------------------------------------------------------------------


def test_tet_quadrature_exact():
    X, Y, Z, W = fsx.tet_quadrature(6)
    assert np.isclose(W.sum(), 1.0 / 6.0, atol=1e-14)   # tet volume
    # exact moments: int x^a y^b z^c = a! b! c! / (a+b+c+3)!
    from math import factorial

    for a in range(4):
        for b in range(4 - a):
            for c in range(4 - a - b):
                exact = (factorial(a) * factorial(b) * factorial(c)
                         / factorial(a + b + c + 3))
                got = (W * X**a * Y**b * Z**c).sum()
                assert np.isclose(got, exact, atol=1e-14), (a, b, c)


def test_tet_basis_partition_of_unity():
    t = fsx.h1_tet_tables(3, 7)
    assert t["B"].shape[1] == 20                        # P3 tet dofs
    assert np.allclose(t["B"].sum(axis=1), 1.0, atol=1e-11)
    assert np.allclose(t["Gx"].sum(axis=1), 0.0, atol=1e-9)
    assert np.allclose(t["Gz"].sum(axis=1), 0.0, atol=1e-9)
    l = fsx.l2_tet_tables(2, 7)
    assert np.allclose(l["B"].sum(axis=1), 1.0, atol=1e-11)


def test_tet_basis_nodal():
    # Lagrange property: evaluating the nodal basis at the lattice nodes
    # themselves gives the identity (rebuild B with the nodes as "quad")
    p = 2
    lat = fsx._bary_lattice_tet(p)
    nodes = lat[:, :3].astype(np.float64) / p
    V = fsx._monomials3(p, nodes[:, 0], nodes[:, 1], nodes[:, 2])
    B_at_nodes = V @ np.linalg.inv(V)
    assert np.allclose(B_at_nodes, np.eye(nodes.shape[0]), atol=1e-10)
    # Bernstein nodal_to_b is the inverse of node sampling: a constant
    # nodal field maps to the constant Bernstein field (PoU inverse)
    l = fsx.l2_tet_tables(2, 4)
    coef = l["nodal_to_b"] @ np.ones(nodes.shape[0])
    assert np.allclose(coef, 1.0, atol=1e-9)


def test_tet_mesh_build_refine():
    m = fsm.make_tet_mesh((2, 2, 2))
    assert m.num_elems == 48                            # 6 tets/cell
    assert np.isclose(m.element_volumes().sum(), 1.0, atol=1e-12)
    # all tets positively oriented under the (V0..V3|x,y,z,1-s) map
    v = m.verts[m.elems]
    d = np.linalg.det(np.stack(
        [v[:, 0] - v[:, 3], v[:, 1] - v[:, 3], v[:, 2] - v[:, 3]],
        axis=-1))
    assert (d > 0).all()
    r = fsm.uniform_refine_tet(m)
    assert r.num_elems == 8 * m.num_elems
    assert np.isclose(r.element_volumes().sum(), 1.0, atol=1e-12)
    # children tile the parent: every child volume positive
    assert (r.element_volumes() > 0).all()
    # boundary triangles cover the 6 unit faces: total area 6, refined 1:4
    assert r.bdr_verts.shape[0] == 4 * m.bdr_verts.shape[0]


def test_tet_h1_dofs():
    m = fsm.make_tet_mesh((1, 1, 1))                    # 6 tets, 8 verts
    sp = fsm.build_tet_h1(m, 1)
    assert sp["ndof"] == 8                              # P1 = vertices
    sp2 = fsm.build_tet_h1(m, 2)
    # P2: verts + edges.  Kuhn cube: 12 cube edges + 6 face diagonals +
    # 1 body diagonal = 19 edges
    assert sp2["ndof"] == 8 + 19
    # essential masks: fixed-x/y/z faces each hold a full boundary face
    assert sp2["ess"].shape == (3, sp2["ndof"])
    assert (sp2["ess"].sum(axis=1) > 0).all()


def test_tet_linear_exactness():
    """P1 interpolation of a linear field is exact at all qpoints, and
    the element Jacobians of the straight mesh are constant."""
    m = fsm.make_tet_mesh((2, 1, 1), (2.0, 1.0, 1.0))
    sp = fsm.build_tet_h1(m, 2)
    t = fsx.h1_tet_tables(2, 5)
    f = (2.0 * sp["coords"][:, 0] - 3.0 * sp["coords"][:, 1]
         + 0.5 * sp["coords"][:, 2] + 1.0)
    fe = f[sp["gather"]]                                # (NE, nd)
    xq = np.einsum("qi,ei->eq", t["B"], fe)
    # reference -> physical positions of the qpoints
    ce = sp["coords"][sp["gather"]]                     # (NE, nd, 3)
    pq = np.einsum("qi,eid->eqd", t["B"], ce)
    want = 2.0 * pq[..., 0] - 3.0 * pq[..., 1] + 0.5 * pq[..., 2] + 1.0
    assert np.allclose(xq, want, atol=1e-12)


@pytest.mark.slow
def test_tet_hydro_static_and_sod():
    from laghos_tpu.hydro import Options
    from laghos_tpu.simplex_hydro import SimplexHydro

    m = fsm.make_tet_mesh((2, 2, 2))
    # static triple point: uniform p, nothing moves
    h3 = SimplexHydro(m, Options(problem=3, cg_tol=1e-12))
    S, t, steps = h3.run(t_final=0.3, max_steps=6)
    e0 = np.asarray(h3.S0["e"])
    e1 = np.asarray(S["e"])
    assert np.allclose(e0, e1, atol=1e-9)
    assert float(np.abs(np.asarray(S["v"])).max()) < 1e-9

    # 3D Sod on tets: runs stably, total energy conserved
    h2 = SimplexHydro(m, Options(problem=2, cg_tol=1e-12))
    E0 = _total_energy(h2, h2.S0)
    S, t, steps = h2.run(t_final=0.05, max_steps=20)
    assert np.all(np.isfinite(np.asarray(S["e"])))
    assert steps > 3
    E1 = _total_energy(h2, S)
    assert abs(E1 - E0) / abs(E0) < 1e-6, (E0, E1)


# ---------------------------------------------------------------------------
# Sources + RK2Avg + anchored accuracy (round-5: the simplex path runs
# EVERY problem class like the reference's geometry switch,
# laghos.cpp:634-648, laghos_solver.hpp:207-231).
# ---------------------------------------------------------------------------


def test_tri_taylor_green_forced_steady():
    """p0 on triangles WITH the manufactured forcing: the TG vortex is
    a steady solution, so the computed velocity must stay at the exact
    field to truncation error — an external anchor (the reference
    reports the same v-vs-exact errors, laghos.cpp:970-983).  Without
    the source term the flow decays ~O(1); 2e-2 at this resolution is
    pure truncation."""
    from laghos_tpu import problems
    from laghos_tpu.hydro import Options
    from laghos_tpu.simplex_hydro import SimplexHydro

    m = fsm.make_tri_mesh((4, 4))
    m = fsm.uniform_refine_tri(m)
    h = SimplexHydro(m, Options(problem=0, order_v=2, order_e=1,
                                cg_tol=1e-12))
    assert h.source == 1
    S, t, steps = h.run(t_final=0.25, max_steps=60)
    v = np.asarray(S["v"])
    x = np.asarray(S["x"]).T
    vex = problems.v0(0, x, 2).T
    err = np.sqrt(((v - vex) ** 2).sum()) / np.sqrt((vex ** 2).sum())
    assert err < 5e-2, err
    assert t >= 0.25 - 1e-12


def test_tri_rayleigh_taylor_runs():
    """p7 (RT gravity + vorticity-scaled viscosity) on a triangulated
    rt2D domain: the constant-in-time M.g source drives the instability
    and the run stays finite with bounded growth at early time."""
    from laghos_tpu.hydro import Options
    from laghos_tpu.simplex_hydro import SimplexHydro

    m = fsm.make_tri_mesh((2, 8), sizes=(0.5, 2.0), origin=(0.0, -1.0))
    h = SimplexHydro(m, Options(problem=7, order_v=2, order_e=1,
                                cg_tol=1e-10))
    assert h.source == 2 and h.rt_rhs is not None and h.use_vort
    S, t, steps = h.run(t_final=0.5, max_steps=25)
    v = np.asarray(S["v"])
    assert np.all(np.isfinite(v)) and np.all(
        np.isfinite(np.asarray(S["e"])))
    vmax = float(np.abs(v).max())
    assert 1e-4 < vmax < 1.0, vmax  # perturbation grew, no blow-up


def test_tri_sedov_rk2avg_conservation():
    """RK2Avg (-s 7) on triangles: total energy drift at round-off
    (the energy equation driven by the stage-averaged velocity)."""
    from laghos_tpu.hydro import Options
    from laghos_tpu.simplex_hydro import SimplexHydro

    m = fsm.load_tri_mesh("/root/reference/data/square01_tri.mesh")
    m = fsm.uniform_refine_tri(m)
    h = SimplexHydro(m, Options(problem=1, ode_solver=7, cg_tol=1e-12))
    E0 = _total_energy(h, h.S0)
    S, t, steps = h.run(t_final=0.3, max_steps=30)
    E1 = _total_energy(h, S)
    assert abs(E1 - E0) / abs(E0) < 1e-11, (E0, E1)


@pytest.mark.slow
def test_tri_sedov_anchored_vs_quad():
    """Anchor the tri answer against the TRUSTED quad path (golden-
    gated in tests/test_verify.py): same domain, same physics, matched
    resolution — the Sedov endpoint |e| agrees to discretization
    accuracy."""
    import jax.numpy as jnp

    from laghos_tpu import driver
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options
    from laghos_tpu.simplex_hydro import SimplexHydro

    opt = dict(problem=1, order_v=2, order_e=1, cg_tol=1e-12)
    mq = fmesh.cartesian(2, (8, 8), (1.0, 1.0))
    hq = Hydro(mq, Options(**opt))
    rq = driver.run(hq, t_final=0.2, max_steps=2000, verbose=False)

    mt = fsm.make_tri_mesh((8, 8))
    ht = SimplexHydro(mt, Options(**opt))
    S, t, steps = ht.run(t_final=0.2, max_steps=2000)
    eq_ = np.einsum("qi,ei->eq", np.asarray(ht.Bl), np.asarray(S["e"]))
    # |e| in the L2 mass norm (the goldens' metric): sqrt(e' Me e)
    Me = np.asarray(ht.massD)
    # tri mesh has 2x the elements of the quad mesh at the same nodes;
    # compare the global L2(e) norms
    en_t = float(np.sqrt((Me * eq_ ** 2).sum()))
    eqq = np.asarray(rq.S["e"])
    Bq = np.asarray(hq.tables["L2B"])
    eq_q = np.einsum("qi,ei->eq", Bq, eqq)
    en_q = float(np.sqrt((np.asarray(hq.massD) * eq_q ** 2).sum()))
    assert abs(en_t - en_q) / en_q < 0.05, (en_t, en_q)
