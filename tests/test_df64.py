"""Double-float (two-f32) qupdate physics: ops/df64, ops/qphys_df64,
ops/pallas_df64.

The f64-accurate (ozaki) production mode's pointwise physics chain
costs ~30 ms at the ns2 q-lattice under XLA's emulated-f64 ops (every
fusion boundary round-trips HBM); the fused Pallas kernel keeps the
chain VMEM-resident in explicit double-float arithmetic at the same
~2^-48 accuracy class.  Gates here:
  * the df64 primitives are error-free / correctly-rounded vs f64;
  * the df64 physics chain matches qphys.physics_3d (true f64) at
    double-float tolerance on a real hydro state;
  * the full Pallas kernel (interpret mode on CPU) matches through the
    production qupdate3d_lattice wiring.

dt tolerances are looser (1e-9) than the stress ones (1e-12): the
hybrid eigen-solve's f32 Jacobi sweep vector shifts by ~1 ulp between
compiled programs (FMA contraction), and the Rayleigh value moves by
theta^2 * spread — an intrinsic property shared by the f64 path
(ops/smallmat.eig3s_hybrid), not a df64 arithmetic error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.ops import df64 as df
from laghos_tpu.ops import qphys, qphys_df64


def test_df64_primitives():
    rng = np.random.default_rng(3)
    a64 = jnp.asarray(rng.standard_normal((8, 128)) * 10.0)
    b64 = jnp.asarray(np.abs(rng.standard_normal((8, 128))) + 0.25)
    A, B = df.from_f64(a64), df.from_f64(b64)
    # split/reconstruct at double-float accuracy (~2^-48 relative: the
    # lo word holds 24 of the residual's 29 bits)
    assert float(jnp.max(jnp.abs(df.to_f64(A) - a64)
                         / jnp.abs(a64))) < 1e-13
    tol = 1e-13
    scale = jnp.abs(a64) + jnp.abs(b64)  # add/sub: error is relative
    for name, got, ref, den in [      # to the OPERAND scale (a near-
        ("add", df.to_f64(df.add(A, B)), a64 + b64, scale),  # cancelled
        ("sub", df.to_f64(df.sub(A, B)), a64 - b64, scale),  # result
        ("mul", df.to_f64(df.mul(A, B)), a64 * b64, None),   # can't beat
        ("div", df.to_f64(df.div(A, B)), a64 / b64, None),   # the input
        ("sqrt", df.to_f64(df.sqrt(B)), jnp.sqrt(b64), None),  # splits'
        ("recip", df.to_f64(df.recip(B)), 1.0 / b64, None),    # 2^-48)
        ("sqr", df.to_f64(df.sqr(A)), a64 * a64, None),
    ]:
        den = jnp.maximum(jnp.abs(ref), 1e-300) if den is None else den
        rel = float(jnp.max(jnp.abs(got - ref) / den))
        assert rel < tol, (name, rel)
    # compare / select semantics
    assert bool(jnp.all(df.lt(A, B) == (df.to_f64(A) < df.to_f64(B))))
    # sqrt(0) == 0 exactly
    z = df.widen(jnp.zeros((4,), jnp.float32))
    assert float(jnp.max(jnp.abs(df.to_f64(df.sqrt(z))))) == 0.0


def _sedov_state(steps=3):
    """A real post-blast 3D Sedov state + its q-lattice operands."""
    from laghos_tpu import driver

    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=4,
                         cg_tol=1e-12, precond="jacobi", ozaki=True))
    res = driver.run(h, t_final=0.6, max_steps=steps, verbose=False)
    return h, res.S


def _lattice_operands(h, S):
    """(J9, dV9, e_q) on the q-lattice via the production oz chains."""
    from laghos_tpu.ops import lattice as lop
    from laghos_tpu.ops import lattice_oz as lzo

    lat, loz = h._lat, h._lat_oz
    x3 = S["x"].reshape((3,) + tuple(h._lat_dims))
    v3 = S["v"].reshape((3,) + tuple(h._lat_dims))
    J9, dV9 = lzo.grad18_lattice_oz(x3, v3, loz)
    e_q = lzo.l2_eval_oz(S["e"], loz)
    e_q = lop.eq_to_qlattice(e_q, h._edims, h.nq1)
    return J9, dV9, e_q


def test_physics_chain_matches_f64():
    """df64 chain vs qphys.physics_3d (true f64) on a real state."""
    h, S = _sedov_state()
    J9, dV9, e_q = _lattice_operands(h, S)
    lat = h._lat
    kw = dict(h1order=float(h.opt.order_v), cfl=h.opt.cfl,
              use_vorticity=False)
    sJ_f, dt_f, _ = qphys.physics_3d(
        J9, dV9, lat["J0i9"], e_q, lat["rw"], lat["gam"], lat["winv"],
        h0_e=lat["h0e"], **kw)

    def pr(a):
        return df.from_f64(a)

    sJ_d, dt_d, _ = qphys_df64.physics_3d_df(
        tuple(pr(a) for a in J9), tuple(pr(a) for a in dV9),
        tuple(pr(a) for a in lat["J0i9"]), pr(e_q),
        pr(lat["rw"] * lat["winv"]), pr(lat["gam"] - 1.0),
        pr(lat["gam"] * (lat["gam"] - 1.0)), pr(1.0 / lat["winv"]),
        pr(lat["h0e"]), **kw)
    for k in range(9):
        scale = float(jnp.max(jnp.abs(sJ_f[k]))) + 1e-300
        rel = float(jnp.max(jnp.abs(df.to_f64(sJ_d[k]) - sJ_f[k]))) / scale
        assert rel < 1e-12, (k, rel)
    dtd = df.to_f64(dt_d)
    # pre-shock points (zero S, zero visc) carry dtq = inf, and the
    # zero/denormal boundary of idt legally differs between the two
    # arithmetics — compare on the reciprocal scale (inf -> 0), with
    # the tolerance relative to the BINDING (largest 1/dt) points
    inv_f = 1.0 / dt_f
    inv_d = 1.0 / dtd
    scale = float(jnp.max(inv_f))
    # 1e-8: points at the idt = 0 sign boundary (S = visc = 0 up to
    # rounding) flip between inf and huge-finite dtq across the two
    # arithmetics at ~1e-9 of the binding scale; the min-dt gate below
    # is the trajectory-relevant one
    assert float(jnp.max(jnp.abs(inv_d - inv_f))) / scale < 1e-8
    # the trajectory-relevant scalar: min dt
    assert abs(float(jnp.min(dtd) - jnp.min(dt_f))
               / float(jnp.min(dt_f))) < 1e-9


def test_pallas_kernel_through_production_wiring():
    """qupdate3d_lattice with df64={'interpret': True} == the f64 oz
    branch, on a real state (full packing / blocking / unpacking)."""
    from laghos_tpu.ops import lattice as lop

    h, S = _sedov_state()
    args = (S["x"], S["v"], S["e"], h._lat, h._lat_dims, h._edims,
            h.tables)
    kw = dict(h1order=float(h.opt.order_v), cfl=h.opt.cfl,
              use_viscosity=True, use_vorticity=False, h0=h.h0,
              oz=h._lat_oz)
    sJ_f, dt_f = lop.qupdate3d_lattice(*args, **kw)
    sJ_p, dt_p = lop.qupdate3d_lattice(*args, **kw,
                                       df64={"interpret": True})
    for k in range(9):
        scale = float(jnp.max(jnp.abs(sJ_f[k]))) + 1e-300
        rel = float(jnp.max(jnp.abs(sJ_p[k] - sJ_f[k]))) / scale
        # 1e-7, not double-float 1e-12: the two sides are DIFFERENT
        # compiled programs, so their f32 Jacobi sweep vectors differ
        # by ~1 ulp (FMA contraction), and near-degenerate strain
        # eigendirections rotate within the cluster — viscosity moves
        # by ~theta*delta at those points (measured 4e-9).  The chain
        # test above pins the arithmetic itself at 1e-12.
        assert rel < 1e-7, (k, rel)
    # the binding min-dt point rides the same cross-program sweep
    # sensitivity (measured 1e-8); dt only steers the adaptive step
    # controller, and the trajectory-level gates below bound the impact
    assert abs(float(dt_p - dt_f) / float(dt_f)) < 1e-7


@pytest.mark.slow
def test_df64_trajectory_drift():
    """Short RK2Avg trajectory with the df64 kernel forced on
    (interpret): total energy conserved to round-off, and the endpoint
    stays within double-float distance of the f64-physics trajectory."""
    from laghos_tpu import driver

    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)

    def run(df_mode):
        h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=7,
                             cg_tol=1e-11, precond="jacobi", ozaki=True,
                             df64_qphys=df_mode))
        return driver.run(h, t_final=0.6, max_steps=6, verbose=False)

    r_f = run("off")
    r_d = run("on")
    drift = abs(r_d.energy_final - r_d.energy_init) / abs(r_d.energy_init)
    assert drift < 1e-11
    assert r_f.steps == r_d.steps
    assert abs(r_d.e_norm - r_f.e_norm) / r_f.e_norm < 1e-9
