"""Matrix-free force operator: the L2<->H1 coupling of momentum and energy.

TPU-native re-design of the reference's ForcePAOperator
(laghos_assembly.cpp:123-973).  The bilinear form is
    F[i(vd), j] = sum_q  (dhat_gd phi_i)(q) * stressJinvT[gd, vd](q) * psi_j(q)
with phi the H1 basis, psi the L2 basis and stressJinvT the per-point
(stress . J^{-1})^T w detJ data produced by qupdate.  Both the action
(energy -> momentum RHS) and its transpose (velocity -> energy RHS) are
chains of sum-factorized batched contractions over the element axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import tensor


def force_mult(e_b, sJit, tables, *, dim: int, ftz_eps2: float):
    """F . e  ->  H1 E-vector (NE, dim, nd).

    Mirrors ForceMult2D/3D (laghos_assembly.cpp:145-514) including the
    flush-to-zero of tiny per-element velocity values with eps^2 of machine
    epsilon (laghos_assembly.cpp:159-160, 278-292).
    """
    d = dim
    H1Bt, H1Gt, L2B = tables["H1B"].T, tables["H1G"].T, tables["L2B"]
    NE = e_b.shape[0]
    l1d = L2B.shape[1]
    nq1 = L2B.shape[0]
    nd1 = H1Bt.shape[0]

    et = e_b.reshape((NE,) + (l1d,) * d)
    EQ = tensor.eval_values(et, L2B, d)            # (NE, q...)
    NQ = nq1**d
    sJ = sJit.reshape((NE,) + (nq1,) * d + (d, d))

    comps = []
    for vd in range(d):
        acc = None
        for gd in range(d):
            term = tensor.grad_transpose(
                EQ * sJ[..., gd, vd], H1Bt, H1Gt, gd, d)
            acc = term if acc is None else acc + term
        comps.append(acc)
    out = jnp.stack(comps, axis=1).reshape(NE, d, nd1**d)
    return jnp.where(jnp.abs(out) < ftz_eps2, 0.0, out)


def force_mult_transpose(v_e, sJit, tables, *, dim: int):
    """F^T . v  ->  L2 vector (NE, l2d)."""
    d = dim
    H1B, H1G, L2Bt = tables["H1B"], tables["H1G"], tables["L2B"].T
    NE = v_e.shape[0]
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    l1d = L2Bt.shape[0]

    vt = v_e.reshape((NE, d) + (nd1,) * d)
    dV = tensor.eval_gradient(vt, H1B, H1G, d)     # (NE, vd, q..., gd)
    sJ = sJit.reshape((NE,) + (nq1,) * d + (d, d))
    # contract: eq_rhs(q) = sum_vd sum_gd dV[vd, q, gd] * sJ[q, gd, vd]
    eq = jnp.einsum("ev...g,e...gv->e...", dV, sJ)
    out = tensor.eval_transpose(eq, L2Bt, d)
    return out.reshape(NE, l1d**d)


def _dense9(tables):
    Bd = tables.get("L2Bd")
    Gd = tables.get("H1Gd")
    return (Bd, Gd) if Bd is not None and Gd is not None else None


def force_mult9_oz(e_b, sJit9, oz, *, ftz_eps2: float):
    """3D F . e on the int8 MXU (f64-accurate, ops/omm.py).

    oz = (l2_fwd (ld, NQ), gcat (3NQ, nd), ...): the three grad-transpose
    directions run as ONE matmul against the row-concatenated static
    [G_0; G_1; G_2], sharing a single dynamic split of the per-direction
    stress-weighted field."""
    from . import omm

    d = 3
    l2_fwd, gcat = oz
    EQ = omm.matmul(e_b, l2_fwd)                   # (NE, NQ)
    Y = jnp.stack([
        jnp.concatenate([EQ * sJit9[gd * d + vd] for gd in range(d)],
                        axis=-1)
        for vd in range(d)], axis=1)               # (NE, d, 3NQ)
    out = omm.matmul(Y, gcat)                      # (NE, d, nd)
    return jnp.where(jnp.abs(out) < ftz_eps2, 0.0, out)


def force_mult_transpose9_oz(v_e, sJit9, oz):
    """3D F^T . v on the int8 MXU (see force_mult9_oz).

    oz = (gcatT (nd, 3NQ), l2_bwd (NQ, ld)): one dynamic split of v_e
    feeds all three gradient directions via the column-concatenated
    static [G_0^T | G_1^T | G_2^T]."""
    from . import omm

    d = 3
    gcatT, l2_bwd = oz
    dv = omm.matmul(v_e, gcatT)                    # (NE, d, 3NQ)
    NQ = dv.shape[-1] // d
    eq = None
    for gd in range(d):
        for vd in range(d):
            term = dv[:, vd, gd * NQ:(gd + 1) * NQ] * sJit9[gd * d + vd]
            eq = term if eq is None else eq + term
    return omm.matmul(eq, l2_bwd)                  # (NE, ld)


def force_mult9(e_b, sJit9, tables, *, ftz_eps2: float):
    """3D F . e with sJit as a 9-tuple of (NE, NQ) component arrays.

    Identical math to force_mult (laghos_assembly.cpp:145-514) but the
    q-data never carries trailing (3, 3) matrix dims: TPU layouts tile
    the two minor axes to (8, 128), so a (NE, NQ, 3, 3) array pads ~57x
    in HBM.  sJit9 index: [gd * 3 + vd]."""
    d = 3
    dense = _dense9(tables)
    if dense is not None:
        L2Bd, H1Gd = dense
        EQ = e_b @ L2Bd.T                          # (NE, NQ)
        comps = []
        for vd in range(d):
            acc = None
            for gd in range(d):
                term = (EQ * sJit9[gd * d + vd]) @ H1Gd[gd]
                acc = term if acc is None else acc + term
            comps.append(acc)
        out = jnp.stack(comps, axis=1)             # (NE, d, nd)
        return jnp.where(jnp.abs(out) < ftz_eps2, 0.0, out)
    H1Bt, H1Gt, L2B = tables["H1B"].T, tables["H1G"].T, tables["L2B"]
    NE = e_b.shape[0]
    l1d = L2B.shape[1]
    nq1 = L2B.shape[0]
    nd1 = H1Bt.shape[0]

    et = e_b.reshape((NE,) + (l1d,) * d)
    EQ = tensor.eval_values(et, L2B, d)            # (NE, q...)
    qshape = (NE,) + (nq1,) * d
    comps = []
    for vd in range(d):
        acc = None
        for gd in range(d):
            sq = sJit9[gd * d + vd].reshape(qshape)
            term = tensor.grad_transpose(EQ * sq, H1Bt, H1Gt, gd, d)
            acc = term if acc is None else acc + term
        comps.append(acc)
    out = jnp.stack(comps, axis=1).reshape(NE, d, nd1**d)
    return jnp.where(jnp.abs(out) < ftz_eps2, 0.0, out)


def force_mult_transpose9(v_e, sJit9, tables):
    """3D F^T . v with component-tuple q-data (see force_mult9)."""
    d = 3
    dense = _dense9(tables)
    if dense is not None:
        L2Bd, H1Gd = dense
        eq = None
        for gd in range(d):
            dv = v_e @ H1Gd[gd].T                  # (NE, d, NQ)
            for vd in range(d):
                term = dv[:, vd] * sJit9[gd * d + vd]
                eq = term if eq is None else eq + term
        return eq @ L2Bd
    H1B, H1G, L2Bt = tables["H1B"], tables["H1G"], tables["L2B"].T
    NE = v_e.shape[0]
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    l1d = L2Bt.shape[0]

    vt = v_e.reshape((NE, d) + (nd1,) * d)
    qshape = (NE,) + (nq1,) * d
    eq = None
    for vd in range(d):
        for gd in range(d):
            dv = tensor.eval_gradient_dir(vt[:, vd], H1B, H1G, gd, d)
            term = dv * sJit9[gd * d + vd].reshape(qshape)
            eq = term if eq is None else eq + term
    out = tensor.eval_transpose(eq, L2Bt, d)
    return out.reshape(NE, l1d**d)
