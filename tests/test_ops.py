"""Operator-level unit gates (SURVEY §7 stage 4): mass SPD, force
adjointness <F.1, v> == <1, F^T v>, interpolation exactness, volume."""

import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options


@pytest.fixture(scope="module")
def hydro2d():
    m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    m = fmesh.uniform_refine(m)
    return Hydro(m, Options(problem=1))


def test_detJ0_and_volume(hydro2d):
    h = hydro2d
    # initial mesh of 16 squares, each 0.25 x 0.25
    detJ0 = 1.0 / np.linalg.det(h.Jac0inv)
    assert np.allclose(detJ0, 1.0 / 16.0, atol=1e-13)
    vol = float(np.sum(h.rho0DetJ0w))  # rho0 = 1 for Sedov
    assert np.isclose(vol, 1.0, atol=1e-13)
    # h0 = sqrt(vol/NE)/order
    assert np.isclose(h.h0, 0.25 / 2.0, atol=1e-14)


def test_h1_mass_spd(hydro2d):
    h = hydro2d
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2, h.ndof)))
    w = jnp.asarray(rng.normal(size=(2, h.ndof)))
    from laghos_tpu.ops import mass as mop

    Mu = mop.h1_mass_apply(u, h.gather, h.ndof, h.massD,
                           h.tables["H1B"], 2)
    Mw = mop.h1_mass_apply(w, h.gather, h.ndof, h.massD,
                           h.tables["H1B"], 2)
    # symmetry
    assert np.isclose(float(jnp.sum(u * Mw)), float(jnp.sum(w * Mu)),
                      rtol=1e-12)
    # positive definiteness
    assert float(jnp.sum(u * Mu)) > 0
    # mass row sums: M . 1 integrates rho0 -> total mass 1
    one = jnp.ones((1, h.ndof))
    assert np.isclose(float(jnp.sum(mop.h1_mass_apply(
        one, h.gather, h.ndof, h.massD, h.tables["H1B"], 2))), 1.0,
        atol=1e-12)


def test_h1_mass_diag_matches_apply(hydro2d):
    h = hydro2d
    from laghos_tpu.ops import mass as mop

    diag = mop.h1_mass_diag(h.gather, h.ndof, h.massD, h.tables["H1B"], 2)
    # check a few unit vectors
    for i in [0, 5, h.ndof - 1]:
        e = jnp.zeros((1, h.ndof)).at[0, i].set(1.0)
        Me = mop.h1_mass_apply(e, h.gather, h.ndof, h.massD,
                               h.tables["H1B"], 2)
        assert np.isclose(float(Me[0, i]), float(diag[i]), rtol=1e-13)


def test_force_adjointness(hydro2d):
    """<F e, v>_H1 == <e, F^T v>_L2 (PA operator pair consistency,
    laghos_assembly.cpp:557-565 vs :965-973)."""
    h = hydro2d
    from laghos_tpu.ops import force as fop
    from laghos_tpu.ops import mass as mop

    rng = np.random.default_rng(1)
    sJit = jnp.asarray(rng.normal(size=(h.NE, h.NQ, 2, 2)))
    e = jnp.asarray(rng.normal(size=(h.NE, h.ld)))
    v = jnp.asarray(rng.normal(size=(2, h.ndof)))

    Fe = fop.force_mult(e, sJit, h.tables, dim=2, ftz_eps2=0.0)
    Fe_l = mop.e_to_l(jnp.swapaxes(Fe, 0, 1), h.gather, h.ndof)
    lhs = float(jnp.sum(Fe_l * v))

    v_e = v[:, h.gather].transpose(1, 0, 2)
    FTv = fop.force_mult_transpose(v_e, sJit, h.tables, dim=2)
    rhs = float(jnp.sum(FTv * e))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_l2_mass_consistency(hydro2d):
    h = hydro2d
    from laghos_tpu.ops import mass as mop

    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(h.NE, h.ld)))
    Mu = mop.mass_apply_e(u, h.massD, h.tables["L2B"], 2)
    M = mop.l2_mass_matrices(h.massD, h.tables["L2B"], 2)
    Mu2 = jnp.einsum("eij,ej->ei", M, u)
    assert np.allclose(np.asarray(Mu), np.asarray(Mu2), atol=1e-13)
    # Me_inv really inverts
    back = jnp.einsum("eij,ej->ei", h.Me_inv, Mu)
    assert np.allclose(np.asarray(back), np.asarray(u), atol=1e-10)


def test_smallmat_eig():
    from laghos_tpu.ops import smallmat

    rng = np.random.default_rng(3)
    A = rng.normal(size=(50, 3, 3))
    A = (A + np.swapaxes(A, -1, -2)) / 2
    lam, vec = smallmat.sym_eig_smallest(jnp.asarray(A), 3)
    lam_np = np.linalg.eigvalsh(A)[:, 0]
    assert np.allclose(np.asarray(lam), lam_np, atol=1e-10)
    # eigenvector property
    r = np.einsum("bij,bj->bi", A, np.asarray(vec)) - (
        np.asarray(lam)[:, None] * np.asarray(vec))
    assert np.abs(r).max() < 1e-8 * np.abs(A).max()
    # zero matrix -> (1, 0, 0) like MFEM's identity fallback
    lam0, v0 = smallmat.sym_eig_smallest(jnp.zeros((1, 3, 3)), 3)
    assert float(lam0[0]) == 0.0
    assert np.allclose(np.asarray(v0[0]), [1, 0, 0])

    A2 = rng.normal(size=(50, 2, 2))
    A2 = (A2 + np.swapaxes(A2, -1, -2)) / 2
    lam2, vec2 = smallmat.sym_eig_smallest(jnp.asarray(A2), 2)
    assert np.allclose(np.asarray(lam2), np.linalg.eigvalsh(A2)[:, 0],
                       atol=1e-12)


def test_min_singular_value():
    from laghos_tpu.ops import smallmat

    rng = np.random.default_rng(4)
    for d in (2, 3):
        J = rng.normal(size=(40, d, d))
        sv = smallmat.min_singular_value(jnp.asarray(J), d)
        sv_np = np.linalg.svd(J, compute_uv=False)[:, -1]
        assert np.allclose(np.asarray(sv), sv_np, atol=1e-8)


def test_cg_solves(hydro2d):
    h = hydro2d
    from laghos_tpu.ops import mass as mop
    from laghos_tpu.solvers.cg import cg

    rng = np.random.default_rng(5)
    xt = jnp.asarray(rng.normal(size=(2, h.ndof)))

    def A(u):
        return mop.h1_mass_apply(u, h.gather, h.ndof, h.massD,
                                 h.tables["H1B"], 2)

    b = A(xt)
    res = cg(A, b, 1e-12, 200,
             precond=lambda r: r * h.h1_dinv[None, :])
    assert bool(jnp.all(res.converged))
    assert np.allclose(np.asarray(res.x), np.asarray(xt), atol=1e-8)
    assert int(res.iters[0]) > 0


def test_fa_assembled_matches_pa(hydro2d):
    """FA==PA operator identity on quads (SURVEY §7 stage-4 gate)."""
    import jax.numpy as jnp
    from laghos_tpu.ops import assemble, force as fop, mass as mop

    h = hydro2d
    rng = np.random.default_rng(7)
    sJit = jnp.asarray(rng.normal(size=(h.NE, h.NQ, 2, 2)))
    e = jnp.asarray(rng.normal(size=(h.NE, h.ld)))
    v = jnp.asarray(rng.normal(size=(2, h.ndof)))

    Fm = assemble.force_element_matrices(sJit, h.tables, dim=2)
    Fe_fa = assemble.force_apply_fa(Fm, e)          # (NE, nd, d)
    Fe_pa = fop.force_mult(e, sJit, h.tables, dim=2, ftz_eps2=0.0)
    assert np.allclose(np.asarray(Fe_fa), np.asarray(
        jnp.moveaxis(Fe_pa, 1, 2)), atol=1e-11)

    v_e = v[:, h.gather].transpose(1, 0, 2)
    FT_fa = assemble.force_apply_transpose_fa(Fm, jnp.moveaxis(
        jnp.moveaxis(v_e, 1, 2), 2, 1))
    FT_pa = fop.force_mult_transpose(v_e, sJit, h.tables, dim=2)
    assert np.allclose(np.asarray(FT_fa), np.asarray(FT_pa), atol=1e-11)

    # global sparse velocity mass == matrix-free apply
    Mel = assemble.h1_mass_element_matrices(h.massD, h.tables["H1B"], 2)
    A = assemble.to_bcoo(Mel, h.h1.gather, h.ndof)
    u = jnp.asarray(rng.normal(size=(h.ndof,)))
    y_sp = A @ u
    y_mf = mop.h1_mass_apply(u[None], h.gather, h.ndof, h.massD,
                             h.tables["H1B"], 2)[0]
    assert np.allclose(np.asarray(y_sp), np.asarray(y_mf), atol=1e-11)


def test_fa_velocity_solve_through_assembled_operator():
    """The -fa production velocity CG runs through the globally
    assembled BCOO mass matrix (laghos_solver.cpp:413-439), not the PA
    matvec: same solution, and a short trajectory matches the
    PA-matvec FA variant."""
    import jax.numpy as jnp
    from laghos_tpu import driver
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options

    def _h(fa_assembled):
        m = fmesh.uniform_refine(fmesh.cartesian(2, (2, 2), (1.0, 1.0)))
        return Hydro(m, Options(problem=1, blast_energy=0.25,
                                p_assembly=False, cg_tol=1e-12,
                                fa_assembled=fa_assembled))

    ha = _h(True)
    hp = _h(False)
    assert ha._h1_bcoo is not None and hp._h1_bcoo is None

    sj, _ = ha._jq(ha.S0)
    B = ha._jprep_v(ha._jforce1(sj))
    xa, _ = ha._jcg_v(B)
    xp, _ = hp._jcg_v(B)
    scale = float(jnp.abs(xp).max()) + 1e-300
    assert float(jnp.abs(xa - xp).max()) / scale < 1e-9

    ra = driver.run(ha, t_final=0.6, max_steps=6, verbose=False)
    rp = driver.run(hp, t_final=0.6, max_steps=6, verbose=False)
    assert ra.steps == rp.steps
    assert abs(ha.e_norm(ra.S) - hp.e_norm(rp.S)) / hp.e_norm(rp.S) < 1e-10
