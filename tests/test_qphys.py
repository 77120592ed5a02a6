"""Fused pointwise physics (qphys / Pallas) vs the validated qupdate path."""

import jax
import jax.numpy as jnp
import numpy as np

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.ops import qupdate as qop
from laghos_tpu.ops import qphys, tensor as top


def _setup():
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    h = Hydro(m, Options(problem=1, blast_energy=2.0))
    # perturb the state so every code path is active
    rng = np.random.default_rng(0)
    S = h.S0
    S = {
        "x": S["x"] + 0.01 * jnp.asarray(rng.normal(size=S["x"].shape)),
        "v": jnp.asarray(rng.normal(size=S["v"].shape)) * 0.1,
        "e": jnp.abs(S["e"]) + 0.5,
    }
    return h, S


def _fields(h, S):
    d = 3
    x_e = S["x"][:, h.gather].transpose(1, 0, 2)
    v_e = S["v"][:, h.gather].transpose(1, 0, 2)
    J = qop.jacobians(x_e, h.tables["H1B"], h.tables["H1G"], d)
    NE = h.NE
    vt = v_e.reshape((NE, d) + (h.nd1,) * d)
    dVt = top.eval_gradient(vt, h.tables["H1B"], h.tables["H1G"], d)
    dV = jnp.moveaxis(dVt.reshape(NE, d, h.NQ, d), 1, 2)
    et = S["e"].reshape((NE,) + (h.l1d,) * d)
    e_q = top.eval_values(et, h.tables["L2B"], d).reshape(NE, h.NQ)
    return J, dV, e_q


def test_qphys_matches_qupdate():
    h, S = _setup()
    sJit_ref, dt_ref = h._qupdate(S)
    if isinstance(sJit_ref, tuple):   # scalarized 3D path returns 9-tuple
        if sJit_ref[0].ndim == 3:     # whole-lattice path: q-lattice shape
            from laghos_tpu.ops import lattice as lop

            sJit_ref = tuple(lop.qlattice_to_eq(a, h._edims, h.nq1)
                             for a in sJit_ref)
        sJit_ref = jnp.stack(sJit_ref, axis=-1).reshape(
            h.NE, h.NQ, 3, 3)

    J, dV, e_q = _fields(h, S)
    winv = jnp.broadcast_to((1.0 / h.tables["W"])[None, :],
                            (h.NE, h.NQ))
    gam = jnp.broadcast_to(h.gamma_j[:, None], (h.NE, h.NQ))

    def unpack(A):
        return tuple(A.reshape(h.NE, h.NQ, 9)[..., k] for k in range(9))

    sJit9, dtq, visc = qphys.physics_3d(
        unpack(J), unpack(dV), unpack(h.Jac0inv_j), e_q,
        h.rho0DetJ0w_j, gam, winv, h0_e=h.h0,
        h1order=float(h.opt.order_v), cfl=h.opt.cfl)
    sJit = jnp.stack(sJit9, axis=-1).reshape(h.NE, h.NQ, 3, 3)
    assert np.isclose(float(jnp.min(dtq)), float(dt_ref), rtol=1e-12)
    scale = float(jnp.abs(sJit_ref).max())
    assert np.abs(np.asarray(sJit) - np.asarray(sJit_ref)).max() \
        < 1e-12 * scale


def test_pallas_qphys_interpret():
    from laghos_tpu.ops import pallas_qphys

    h, S = _setup()
    sJit_ref, dt_ref = h._qupdate(S)
    if isinstance(sJit_ref, tuple):   # scalarized 3D path returns 9-tuple
        if sJit_ref[0].ndim == 3:     # whole-lattice path: q-lattice shape
            from laghos_tpu.ops import lattice as lop

            sJit_ref = tuple(lop.qlattice_to_eq(a, h._edims, h.nq1)
                             for a in sJit_ref)
        sJit_ref = jnp.stack(sJit_ref, axis=-1).reshape(
            h.NE, h.NQ, 3, 3)
    J, dV, e_q = _fields(h, S)
    sJit, dtq, visc = pallas_qphys.physics_3d_pallas(
        J, dV, h.Jac0inv_j, e_q, h.rho0DetJ0w_j, h.gamma_j,
        h.tables["W"], h0=h.h0, h1order=float(h.opt.order_v),
        cfl=h.opt.cfl, interpret=True)
    assert np.isclose(float(jnp.min(dtq)), float(dt_ref), rtol=1e-12)
    scale = float(jnp.abs(sJit_ref).max())
    err = np.abs(np.asarray(sJit) - np.asarray(sJit_ref)).max()
    assert err < 1e-12 * scale


def test_physics_3d_no_64bit_leaks():
    """Mosaic rejects any 64-bit value inside a Pallas TPU kernel; weak
    python literals promote to f64/i64 under x64 mode, so the physics
    chain must build every constant dtype-matched."""
    import re

    f32 = lambda: jnp.ones((8, 128), jnp.float32)
    J = tuple(f32() for _ in range(9))
    dV = tuple(f32() for _ in range(9))
    J0i = tuple(f32() for _ in range(9))

    def fn(*a):
        return qphys.physics_3d(
            a[:9], a[9:18], a[18:27], a[27], a[28], 1.4, a[29],
            h0_e=a[30], h1order=2.0, cfl=0.5)

    jaxpr = jax.make_jaxpr(fn)(*J, *dV, *J0i, f32(), f32(), f32(), f32())
    hits = sorted(set(re.findall(r"(f64|i64|u64)", str(jaxpr))))
    assert not hits, f"64-bit values leaked into the kernel: {hits}"


def test_qupdate3d_inviscid_matches_generic():
    """p0-style (no viscosity) 3D qupdate: the scalarized path must agree
    with the generic path on BOTH sJit and the dt estimate (regression:
    a spurious sound-speed viscosity once leaked into dt)."""
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=0))
    assert not h.use_visc
    S = h.S0
    sj9, dt9 = h._qupdate(S)
    sj, dt_old = qop.qupdate(
        h._gather_e(S["x"]), h._gather_e(S["v"]), S["e"], h.gamma_j,
        h.rho0DetJ0w_j, h.Jac0inv_j, h.tables, h.h0, dim=3,
        h1order=float(h.opt.order_v), cfl=h.opt.cfl,
        use_viscosity=False, use_vorticity=False)
    assert np.isclose(float(dt9), float(dt_old), rtol=1e-13)
    if sj9[0].ndim == 3:              # whole-lattice path: q-lattice shape
        from laghos_tpu.ops import lattice as lop

        sj9 = tuple(lop.qlattice_to_eq(a, h._edims, h.nq1) for a in sj9)
    s9 = jnp.stack(sj9, axis=-1).reshape(h.NE, h.NQ, 3, 3)
    assert np.abs(np.asarray(s9) - np.asarray(sj)).max() < 1e-13
