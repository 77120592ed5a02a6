"""Full-assembly operators: element matrices + global sparse actions.

The reference's full-assembly (-fa) path assembles the force operator as a
CSR matrix each step and the velocity mass as a hypre matrix once
(SURVEY M8, laghos_assembly.cpp:43-78, laghos_solver.cpp:201-221,413-439).
TPU-native equivalent: per-element dense matrices built by einsum from the
same quadrature data, applied either element-wise (batched dense action)
or through a global BCOO sparse matrix for interoperability.  The math is
identical to the PA action; this path exists as the low-order/simplex
fallback and for operator export.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def force_element_matrices(sJit, tables, *, dim: int):
    """Per-element force matrices F_e[(i,vd), j] (laghos_assembly.cpp:43-78).

    F_e[i,vd,j] = sum_q dhat_gd phi_i(q) * sJit[gd,vd](q) * psi_j(q)
    """
    H1B, H1G, L2B = tables["H1B"], tables["H1G"], tables["L2B"]
    nq1, nd1 = H1B.shape
    l1d = L2B.shape[1]
    NE = sJit.shape[0]
    NQ = nq1**dim

    # full tensor-product basis tables at all NQ points
    def full_tab(B):
        out = np.asarray(B)
        full = out
        for _ in range(dim - 1):
            full = np.kron(np.asarray(B), full)
        return jnp.asarray(full)

    PHI = full_tab(L2B)                      # (NQ, ld)
    # gradient tables per direction
    grads = []
    for b in range(dim):
        mats = [np.asarray(H1G) if k == b else np.asarray(H1B)
                for k in range(dim)]
        full = mats[0]
        for k in range(1, dim):
            full = np.kron(mats[k], full)    # kron: slowest factor last
        grads.append(jnp.asarray(full))
    G = jnp.stack(grads, axis=0)             # (dim, NQ, nd)

    sJ = sJit.reshape(NE, NQ, dim, dim)      # [gd, vd]
    return jnp.einsum("gqi,eqgv,qj->eivj", G, sJ, PHI)


def force_apply_fa(Fmat, e_b):
    """F . e via assembled element matrices: (NE, nd, d)."""
    return jnp.einsum("eivj,ej->eiv", Fmat, e_b)


def force_apply_transpose_fa(Fmat, v_e):
    """F^T . v via assembled element matrices; v_e (NE, d, nd)."""
    return jnp.einsum("eivj,evi->ej", Fmat, v_e)


def h1_mass_element_matrices(D, B, dim):
    """Dense element mass matrices for the (scalar) H1 space."""
    out = np.asarray(B)
    full = out
    for _ in range(dim - 1):
        full = np.kron(np.asarray(B), full)
    full = jnp.asarray(full)
    return jnp.einsum("qi,qj,eq->eij", full, full, D)


def to_bcoo(elem_mats, gather, ndof):
    """Scatter element matrices into a global BCOO sparse matrix."""
    from jax.experimental import sparse

    NE, nd, _ = elem_mats.shape
    rows = jnp.asarray(gather)[:, :, None]            # (NE, nd, 1)
    cols = jnp.asarray(gather)[:, None, :]            # (NE, 1, nd)
    idx = jnp.stack([jnp.broadcast_to(rows, (NE, nd, nd)).reshape(-1),
                     jnp.broadcast_to(cols, (NE, nd, nd)).reshape(-1)],
                    axis=1)
    mat = sparse.BCOO((elem_mats.reshape(-1), idx), shape=(ndof, ndof))
    return mat.sum_duplicates()
