"""Quadrature-point physics: EOS, artificial viscosity, dt estimate, stress.

TPU-native re-design of the reference's QUpdate kernel
(laghos_solver.cpp:1042-1168, QUpdateBody): one fused, fully vectorized
computation over the (element, qpoint) axes instead of a per-thread device
loop.  Everything is expressed as batched tensor algebra so XLA fuses the
EOS/viscosity/stress pipeline into the surrounding contractions.

Physics (ideal gas, cf. laghos_solver.hpp:151-160):
    p  = (gamma - 1) rho e,    cs = sqrt(gamma (gamma-1) e)
with the tensor artificial viscosity of Dobrev/Kolev/Rieben built from the
eigen-decomposition of the symmetrized velocity gradient.
"""

from __future__ import annotations


import jax.numpy as jnp

from . import smallmat, tensor


def smooth_step_01(x, eps):
    """C1 ramp 0->1 over [-eps, eps] (laghos_solver.cpp:798-805)."""
    y = (x + eps) / (2.0 * eps)
    y = jnp.clip(y, 0.0, 1.0)
    return (3.0 - 2.0 * y) * y * y


def qupdate(
    x_e,            # (NE, dim, nd1^d) H1 positions, element layout
    v_e,            # (NE, dim, nd1^d) H1 velocities
    e_b,            # (NE, l1d^d) L2 energy (Bernstein coeffs)
    gamma,          # (NE,)
    rho0DetJ0w,     # (NE, NQ)
    Jac0inv,        # (NE, NQ, d, d)
    tables,         # dict of basis tables (H1B,H1G,L2B) + weights W
    h0,             # scalar
    *,
    dim: int,
    h1order: float,
    cfl: float,
    use_viscosity: bool,
    use_vorticity: bool,
    elem_valid=None,   # (NE,) bool: mask padded elements (halo layouts)
):
    """Returns (stressJinvT (NE,NQ,d,d) indexed [gd,vd], dt_est scalar).

    The per-point dt estimate replicates laghos_solver.cpp:1135-1156,
    including the detJ<0 -> dt_est=0 step-rejection trigger.
    """
    d = dim
    NE = x_e.shape[0]
    H1B, H1G, L2B, W = (tables["H1B"], tables["H1G"], tables["L2B"],
                        tables["W"])
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    NQ = nq1**d
    l1d = L2B.shape[1]

    xt = x_e.reshape((NE, d) + (nd1,) * d)
    vt = v_e.reshape((NE, d) + (nd1,) * d)
    # J[e, a, q..., b] = dx_a/dxhat_b
    Jt = tensor.eval_gradient(xt, H1B, H1G, d)     # (NE, d, q..., d)
    J = jnp.moveaxis(Jt.reshape(NE, d, NQ, d), 1, 2)  # (NE, NQ, a, b)
    detJ = smallmat.det(J, d)
    Jinv = smallmat.inv(J, d, detJ)

    et = e_b.reshape((NE,) + (l1d,) * d)
    e_q = tensor.eval_values(et, L2B, d).reshape(NE, NQ)

    R = rho0DetJ0w / (detJ * W[None, :])
    E = jnp.maximum(0.0, e_q)
    g = gamma[:, None]
    P = (g - 1.0) * R * E
    S = jnp.sqrt(g * (g - 1.0) * E)

    eye = jnp.eye(d, dtype=x_e.dtype)
    stress = -P[..., None, None] * eye

    visc_coeff = jnp.zeros_like(R)
    if use_viscosity:
        dVt = tensor.eval_gradient(vt, H1B, H1G, d)
        dV = jnp.moveaxis(dVt.reshape(NE, d, NQ, d), 1, 2)  # dv_a/dxhat_b
        sgrad = jnp.einsum("...ab,...bk->...ak", dV, Jinv)  # physical grad

        vorticity_coeff = 1.0
        if use_vorticity:
            grad_norm = jnp.sqrt(jnp.sum(sgrad * sgrad, axis=(-2, -1)))
            div_v = jnp.abs(jnp.einsum("...aa->...", sgrad))
            vorticity_coeff = jnp.where(grad_norm > 0.0,
                                        div_v / jnp.maximum(grad_norm, 1e-300),
                                        1.0)

        sym = 0.5 * (sgrad + jnp.swapaxes(sgrad, -2, -1))
        mu, compr_dir = smallmat.sym_eig_smallest(sym, d)
        Jpi = jnp.einsum("...ab,...bk->...ak", J, Jac0inv)
        ph_dir = jnp.einsum("...ab,...b->...a", Jpi, compr_dir)
        h = (h0 * jnp.linalg.norm(ph_dir, axis=-1)
             / jnp.linalg.norm(compr_dir, axis=-1))
        visc_coeff = 2.0 * R * h * h * jnp.abs(mu)
        eps = 1e-12
        visc_coeff = visc_coeff + (
            0.5 * R * h * S * vorticity_coeff
            * (1.0 - smooth_step_01(mu - 2.0 * eps, eps)))
        stress = stress + visc_coeff[..., None, None] * sym

    sv = smallmat.min_singular_value(J, d)
    h_min = sv / h1order
    ih_min = 1.0 / h_min
    idt = S * ih_min + 2.5 * visc_coeff * ih_min * ih_min / R
    inf = jnp.asarray(jnp.inf, dtype=x_e.dtype)
    dtq = jnp.where(idt > 0.0, cfl / jnp.where(idt > 0.0, idt, 1.0), inf)
    # reject inverted elements AND non-finite qdata (NaN would slip
    # through the `<` comparison and read as dt = inf)
    good = jnp.isfinite(detJ) & (detJ >= 0.0) & ~jnp.isnan(idt)
    dtq = jnp.where(good, dtq, 0.0)

    # stressJinvT[gd, vd] = sum_k stress[vd,k] Jinv[gd,k] * w * detJ
    sJit = jnp.einsum("...vk,...gk->...gv", stress, Jinv)
    sJit = sJit * (W[None, :] * detJ)[..., None, None]
    if elem_valid is not None:
        dtq = jnp.where(elem_valid[:, None], dtq, inf)
        sJit = jnp.where(elem_valid[:, None, None, None], sJit, 0.0)
    dt_est = jnp.min(dtq)
    return sJit, dt_est


def jacobians(x_e, H1B, H1G, dim):
    """Current-configuration Jacobians at qpoints: (NE, NQ, a, b)."""
    NE = x_e.shape[0]
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    xt = x_e.reshape((NE, dim) + (nd1,) * dim)
    Jt = tensor.eval_gradient(xt, H1B, H1G, dim)
    return jnp.moveaxis(Jt.reshape(NE, dim, nq1**dim, dim), 1, 2)


def qupdate3d(
    x_e, v_e, e_b, gamma, rho0DetJ0w, Jac0inv9, tables, h0,
    *, h1order, cfl, use_viscosity, use_vorticity,
    elem_valid=None, pallas=False, interpret=False, oz=None,
):
    """Scalarized 3D qupdate: returns (sJit 9-tuple of (NE, NQ), dt_est).

    Same physics as `qupdate` (laghos_solver.cpp:1042-1168) but carried
    as 9 independent (NE, NQ) component arrays end-to-end: TPU layouts
    tile the two minor axes to (8, 128), so any array with trailing
    (3, 3) matrix dims pads ~57x in HBM.  This path never materializes
    one.  Jac0inv9 is the matching 9-tuple of (NE, NQ) arrays.
    With pallas=True the pointwise physics chain runs as a fused Pallas
    VPU kernel instead of inline XLA ops.
    """
    from . import qphys
    from . import pallas_qphys

    d = 3
    NE = x_e.shape[0]
    H1B, H1G, L2B, W = (tables["H1B"], tables["H1G"], tables["L2B"],
                        tables["W"])
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    NQ = nq1**d
    l1d = L2B.shape[1]

    H1Gd = tables.get("H1Gd")
    L2Bd = tables.get("L2Bd")
    if oz is not None:
        # int8-MXU f64 interpolation (ops/omm.py): ONE dynamic split of
        # the stacked (x, v) E-vectors feeds all three gradient
        # directions through the column-concatenated static operator
        from . import omm

        gcatT, l2_fwd = oz
        xv = jnp.concatenate([x_e, v_e], axis=1)       # (NE, 2d, nd)
        dxv = omm.matmul(xv, gcatT)                    # (NE, 2d, 3NQ)
        J9 = tuple(dxv[:, a, b * NQ:(b + 1) * NQ]
                   for a in range(d) for b in range(d))
        dV9 = tuple(dxv[:, d + a, b * NQ:(b + 1) * NQ]
                    for a in range(d) for b in range(d))
        e_q = omm.matmul(e_b, l2_fwd)
    elif H1Gd is not None:
        # dense (NQ, nd) operators: one MXU matmul per direction for all
        # d components at once
        dx = [x_e @ H1Gd[b].T for b in range(d)]   # (NE, d, NQ) each
        dv = [v_e @ H1Gd[b].T for b in range(d)]
        J9 = tuple(dx[b][:, a] for a in range(d) for b in range(d))
        dV9 = tuple(dv[b][:, a] for a in range(d) for b in range(d))
        e_q = e_b @ L2Bd.T
    else:
        xt = x_e.reshape((NE, d) + (nd1,) * d)
        vt = v_e.reshape((NE, d) + (nd1,) * d)
        J9 = tuple(
            tensor.eval_gradient_dir(xt[:, a], H1B, H1G, b, d).reshape(
                NE, NQ)
            for a in range(d) for b in range(d))
        dV9 = tuple(
            tensor.eval_gradient_dir(vt[:, a], H1B, H1G, b, d).reshape(
                NE, NQ)
            for a in range(d) for b in range(d))
        et = e_b.reshape((NE,) + (l1d,) * d)
        e_q = tensor.eval_values(et, L2B, d).reshape(NE, NQ)

    gam = gamma[:, None]
    winv = 1.0 / W[None, :]
    h0_e = jnp.full_like(e_q, h0)
    if not use_viscosity:
        # pressure-only stress (inviscid problems): physics_3d skips the
        # eigen-solve and the artificial-viscosity terms entirely
        sJit9, dtq, _ = qphys.physics_3d(
            J9, tuple(jnp.zeros_like(e_q) for _ in range(9)), Jac0inv9,
            e_q, rho0DetJ0w, gam, winv, h0_e=h0_e, h1order=h1order,
            cfl=cfl, use_viscosity=False, use_vorticity=False)
    elif pallas:
        sJit9, dtq, _ = pallas_qphys.physics_3d_pallas9(
            J9, dV9, Jac0inv9, e_q, rho0DetJ0w, gam, W,
            h0=h0, h1order=h1order, cfl=cfl,
            use_vorticity=use_vorticity, interpret=interpret)
    else:
        sJit9, dtq, _ = qphys.physics_3d(
            J9, dV9, Jac0inv9, e_q, rho0DetJ0w, gam, winv,
            h0_e=h0_e, h1order=h1order, cfl=cfl,
            use_vorticity=use_vorticity)
    if elem_valid is not None:
        inf = jnp.asarray(jnp.inf, dtype=x_e.dtype)
        dtq = jnp.where(elem_valid[:, None], dtq, inf)
        sJit9 = tuple(jnp.where(elem_valid[:, None], s, 0.0)
                      for s in sJit9)
    return sJit9, jnp.min(dtq)
