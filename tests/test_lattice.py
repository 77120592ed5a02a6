"""Whole-lattice banded-matmul operators (ops/lattice.py) vs the
sum-factorized E-form pipeline: exactness of every hot operator and
full-trajectory equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.ops import lattice as lop


def _pair(dim=3, rs=2, **kw):
    m = fmesh.cartesian(dim, (2,) * dim, (1.0,) * dim)
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    kw.setdefault("problem", 1)
    kw.setdefault("blast_energy", 2.0)
    return (Hydro(m, Options(lattice_ops=True, **kw)),
            Hydro(m, Options(lattice_ops=False, **kw)))


def _rand_state(h, seed=0):
    rng = np.random.default_rng(seed)
    S = h.S0
    return {
        "x": S["x"] + 0.01 * jnp.asarray(rng.normal(size=S["x"].shape)),
        "v": jnp.asarray(0.1 * rng.normal(size=S["v"].shape)),
        "e": jnp.abs(S["e"]) + 0.5,
    }


@pytest.mark.parametrize("dim", [2, 3])
def test_mass_apply_matches_eform(dim):
    h1, h0 = _pair(dim=dim, rs=3 if dim == 2 else 2)
    assert h1._lat is not None
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(dim, h1.ndof)))
    y1 = h1._h1_apply_bc(u)
    y0 = h0._h1_apply_bc(u)
    scale = float(jnp.max(jnp.abs(y0)))
    assert float(jnp.max(jnp.abs(y1 - y0))) < 1e-13 * scale


def test_qupdate_and_force_match_eform():
    h1, h0 = _pair()
    assert h1._latq
    S = _rand_state(h1)
    sL, dtL = h1._qupdate(S)
    sE, dtE = h0._qupdate(S)
    assert np.isclose(float(dtL), float(dtE), rtol=1e-13)
    for i in range(9):
        a = lop.qlattice_to_eq(sL[i], h1._edims, h1.nq1)
        scale = float(jnp.max(jnp.abs(sE[i]))) + 1e-300
        # summation-order differences amplify through the Jacobi eig at
        # near-degenerate points of the random state: ~1e-11 relative
        assert float(jnp.max(jnp.abs(a - sE[i]))) < 1e-10 * scale
    f1 = h1._force_rhs_raw(sL)
    f0 = h0._force_rhs_raw(sE)
    scale = float(jnp.max(jnp.abs(f0)))
    assert float(jnp.max(jnp.abs(f1 - f0))) < 1e-10 * scale
    t1 = h1._force_transpose(sL, S["v"])
    t0 = h0._force_transpose(sE, S["v"])
    scale = float(jnp.max(jnp.abs(t0)))
    assert float(jnp.max(jnp.abs(t1 - t0))) < 1e-10 * scale


@pytest.mark.slow
def test_lattice_trajectory_matches_eform():
    h1, h0 = _pair(rs=2)
    r1 = driver.run(h1, t_final=0.6, max_steps=10, verbose=False)
    r0 = driver.run(h0, t_final=0.6, max_steps=10, verbose=False)
    assert r1.steps == r0.steps
    assert abs(r1.e_norm - r0.e_norm) / r0.e_norm < 1e-11


def test_banded_table_partition_of_unity():
    """Rows of the banded eval table must reproduce constants: summing
    T^T over lattice dofs at any qpoint gives 1 (basis partition of
    unity), and T^T 1_q integrates weights consistently."""
    from laghos_tpu.fem import basis as fb

    B = fb.h1_gl_basis(2, 4).B
    T = lop.banded_eval_table(np.asarray(B), 5)
    assert np.allclose(T.sum(axis=0), 1.0)


def test_qupdate_and_force_match_eform_2d():
    """2D whole-lattice qupdate/force (ops/lattice.qupdate2d_lattice,
    physics_2d) vs the generic tensor E-form path.

    rs=2 with a perturbation well under the dof spacing: an inverted
    element (detJ < 0) makes both paths compute 1/detJ-amplified
    garbage at that point, which matches only to O(1) — the real
    trajectories never see such states (dt=0 rejects the step)."""
    h1, h0 = _pair(dim=2, rs=2)
    assert h1._latq
    rng = np.random.default_rng(0)
    S = {
        "x": h1.S0["x"] + 0.005 * jnp.asarray(
            rng.normal(size=h1.S0["x"].shape)),
        "v": jnp.asarray(0.1 * rng.normal(size=h1.S0["v"].shape)),
        "e": jnp.abs(h1.S0["e"]) + 0.5,
    }
    sL, dtL = h1._qupdate(S)
    sE, dtE = h0._qupdate(S)
    assert float(dtE) > 0.0  # no inverted elements in the test state
    assert np.isclose(float(dtL), float(dtE), rtol=1e-12)
    assert isinstance(sL, tuple) and len(sL) == 4
    for gd in range(2):
        for vd in range(2):
            a = lop.qlattice_to_eq_2d(sL[gd * 2 + vd], h1._edims, h1.nq1)
            b = sE[..., gd, vd]
            scale = float(jnp.max(jnp.abs(b))) + 1e-300
            assert float(jnp.max(jnp.abs(a - b))) < 1e-10 * scale
    f1 = h1._force_rhs_raw(sL)
    f0 = h0._force_rhs_raw(sE)
    scale = float(jnp.max(jnp.abs(f0)))
    assert float(jnp.max(jnp.abs(f1 - f0))) < 1e-10 * scale
    t1 = h1._force_transpose(sL, S["v"])
    t0 = h0._force_transpose(sE, S["v"])
    scale = float(jnp.max(jnp.abs(t0)))
    assert float(jnp.max(jnp.abs(t1 - t0))) < 1e-10 * scale

    # vorticity branch (p7's flag) parity, called directly
    from laghos_tpu.ops import qupdate as qop

    sL2, dtL2 = lop.qupdate2d_lattice(
        S["x"], S["v"], S["e"], h1._lat, h1._lat_dims, h1._edims,
        h1.tables, h1order=2.0, cfl=0.5, use_viscosity=True,
        use_vorticity=True)
    sE2, dtE2 = qop.qupdate(
        h0._gather_e(S["x"]), h0._gather_e(S["v"]), S["e"], h0.gamma_j,
        h0.rho0DetJ0w_j, h0.Jac0inv_j, h0.tables, h0.h0, dim=2,
        h1order=2.0, cfl=0.5, use_viscosity=True, use_vorticity=True)
    assert np.isclose(float(dtL2), float(dtE2), rtol=1e-12)
    for gd in range(2):
        for vd in range(2):
            a = lop.qlattice_to_eq_2d(sL2[gd * 2 + vd], h1._edims, h1.nq1)
            b = sE2[..., gd, vd]
            scale = float(jnp.max(jnp.abs(b))) + 1e-300
            assert float(jnp.max(jnp.abs(a - b))) < 1e-10 * scale


def test_lattice_trajectory_matches_eform_2d():
    """Short 2D trajectory through the whole-lattice path == E-form."""
    h1, h0 = _pair(dim=2, rs=2, problem=3)
    assert h1._latq and not h0._latq
    r1 = driver.run(h1, t_final=0.5, max_steps=8, verbose=False)
    r0 = driver.run(h0, t_final=0.5, max_steps=8, verbose=False)
    assert r1.steps == r0.steps
    assert abs(r1.e_norm - r0.e_norm) / r0.e_norm < 1e-11
