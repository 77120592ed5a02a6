"""Partial-assembly mass operators (velocity H1 / energy L2) + diagonals.

TPU-native equivalent of MFEM's PA MassIntegrator as used by the reference's
MassPAOperator (laghos_assembly.cpp:80-121, SURVEY M6): the mass matrices
are constant in time by pointwise mass conservation, with per-point data
    D(q) = w_q rho0(x_q(0)) detJ0(q)
so each apply is B^T (D . (B u)) batched over elements, plus the
gather/scatter of the continuous H1 space.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import tensor


def l_to_e(u_l, gather):
    """L-vector (..., ndof) -> E-vector (..., NE, nd) gather."""
    return u_l[..., gather]


def e_to_l(u_e, gather, ndof):
    """E-vector scatter-add (transpose of l_to_e); deterministic on XLA."""
    lead = u_e.shape[:-2]
    flat = u_e.reshape(lead + (-1,))
    out = jnp.zeros(lead + (ndof,), dtype=u_e.dtype)
    idx = gather.reshape(-1)
    return out.at[..., idx].add(flat)


def build_incidence(gather, ndof):
    """Transpose of the gather map as a padded incidence table.

    For each global dof: the flat E-vector positions contributing to it
    (padded with a sentinel).  Turns assembly into gather+sum — the
    TPU-friendlier dual of scatter-add (gathers pipeline better through
    the VMEM path than scatters).
    Returns (incidence (ndof, V) int32, mask (ndof, V) float).
    """
    import numpy as np

    g = np.asarray(gather).reshape(-1)
    order = np.argsort(g, kind="stable")
    sorted_g = g[order]
    counts = np.bincount(sorted_g, minlength=ndof)
    V = int(counts.max())
    inc = np.zeros((ndof, V), dtype=np.int32)
    msk = np.zeros((ndof, V))
    pos = np.zeros(ndof, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for v in range(V):
        sel = counts > v
        idx = starts[sel] + v
        inc[sel, v] = order[idx]
        msk[sel, v] = 1.0
    return inc, msk


def e_to_l_gather(u_e, incidence, mask):
    """Assembly via the incidence table: (..., NE, nd) -> (..., ndof)."""
    lead = u_e.shape[:-2]
    flat = u_e.reshape(lead + (-1,))
    vals = flat[..., incidence]                 # (..., ndof, V)
    return jnp.sum(vals * mask, axis=-1)


def mass_apply_e(u_e, D, B, dim, Bd=None, oz=None):
    """Element-local mass apply: B^T (D * (B u)) on (..., NE, nd).

    With Bd (dense (NQ, nd) operator, tensor.dense_ops) the apply is two
    MXU matmuls instead of 2*dim bandwidth-bound tiny-axis passes.
    With oz = (fwd StaticSplit (nd, NQ), bwd StaticSplit (NQ, nd)) the two
    matmuls run f64-accurately on the int8 MXU (ops/omm.py) — the TPU
    production path for f64, where XLA would otherwise emulate the
    contraction on the VPU at ~1/10 speed."""
    if oz is not None:
        from . import omm

        fwd, bwd = oz
        q = omm.matmul(u_e, fwd)
        return omm.matmul(q * D, bwd)
    if Bd is not None:
        q = u_e @ Bd.T
        return (q * D) @ Bd
    nd1 = B.shape[1]
    nq1 = B.shape[0]
    shp = u_e.shape
    ut = u_e.reshape(shp[:-1] + (nd1,) * dim)
    q = tensor.eval_values(ut, B, dim)
    Dq = D.reshape(D.shape[:-1] + (nq1,) * dim)
    q = q * Dq
    out = tensor.eval_transpose(q, B.T, dim)
    return out.reshape(shp)


def h1_mass_apply(u_l, gather, ndof, D, B, dim):
    """Assembled-action H1 mass: scatter-add(B^T D B gather(u))."""
    ue = l_to_e(u_l, gather)
    ue = mass_apply_e(ue, D, B, dim)
    return e_to_l(ue, gather, ndof)


def h1_mass_diag(gather, ndof, D, B, dim):
    """Diagonal of the assembled H1 mass (for Jacobi preconditioning).

    diag_i = sum_e sum_q phi_i(q)^2 D(q), exploiting the tensor
    factorization phi^2 = prod B^2 (OperatorJacobiSmoother equivalent,
    laghos_solver.cpp:266-270).
    """
    nq1 = B.shape[0]
    B2t = (B * B).T
    Dq = D.reshape(D.shape[:-1] + (nq1,) * dim)
    de = tensor.eval_transpose(Dq, B2t, dim)
    de = de.reshape(D.shape[0], -1)
    return e_to_l(de, gather, ndof)


def h1_full_basis(B, dim):
    """Dense (NQ, nd) basis-value matrix, x-fastest lex on both axes."""
    import numpy as np

    full = np.array(B)
    for _ in range(dim - 1):
        full = np.kron(np.array(B), full)
    return full


def element_mass_matrices(D, B, dim):
    """Per-element dense mass matrices M_e[i,j] = sum_q phi_i phi_j D
    for a tensor-product basis with 1D table B (host NumPy)."""
    import numpy as np

    full = h1_full_basis(B, dim)
    return np.einsum("qi,qj,eq->eij", full, full, np.asarray(D))


def l2_mass_matrices(D, B, dim):
    """Dense per-element L2 mass matrices M_e[i,j] = sum_q psi_i psi_j D."""
    import numpy as np

    # Full basis matrix (NQ, ld) with x-fastest lex on both axes:
    # kron(B_z, kron(B_y, B_x)) since kron puts the first factor slowest.
    full = np.array(B)
    for _ in range(dim - 1):
        full = np.kron(np.array(B), full)
    full = jnp.asarray(full)
    return jnp.einsum("qi,qj,eq->eij", full, full, D)
