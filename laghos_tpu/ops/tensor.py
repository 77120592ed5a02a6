"""Sum-factorized tensor-product contractions.

The TPU-native replacement for MFEM's QuadratureInterpolator and the 1D
contraction structure of the reference's force kernels (SURVEY M4/M5,
laghos_assembly.cpp:145-514): every dof<->qpoint transformation is a chain
of small batched matmuls over the element axis, which XLA fuses and maps to
the MXU.

Conventions
-----------
Element tensors carry their 1D axes LAST, x-axis last of all:
    u : (..., m_{d-1}, ..., m_1, m_0)    # m_0 is the x direction
which matches MFEM's lexicographic (x-fastest) flattening under C-order
reshape.  1D tables are (npts, ndof): rows are evaluation points.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_axis(u: jnp.ndarray, mat: jnp.ndarray, k: int, d: int):
    """Contract direction-k axis (x = 0) of `u` with `mat` (out, in)."""
    ax = u.ndim - 1 - k
    out = jnp.tensordot(u, mat, axes=[[ax], [1]])
    return jnp.moveaxis(out, -1, ax)


def eval_values(u: jnp.ndarray, B: jnp.ndarray, d: int) -> jnp.ndarray:
    """Interpolate dof tensor to the tensor point set: apply B on all axes."""
    for k in range(d):
        u = apply_axis(u, B, k, d)
    return u


def eval_gradient(u: jnp.ndarray, B: jnp.ndarray, G: jnp.ndarray, d: int):
    """Reference-space gradient at tensor points.

    Returns shape (..., q_{d-1}, ..., q_0, d); last axis is the derivative
    direction b with du/dx̂_b.
    """
    outs = []
    for b in range(d):
        v = u
        for k in range(d):
            v = apply_axis(v, G if k == b else B, k, d)
        outs.append(v)
    return jnp.stack(outs, axis=-1)


def eval_transpose(u: jnp.ndarray, Bt: jnp.ndarray, d: int) -> jnp.ndarray:
    """Transpose interpolation (qpoints -> dofs): apply Bt on all axes."""
    for k in range(d):
        u = apply_axis(u, Bt, k, d)
    return u


def grad_transpose(uq: jnp.ndarray, Bt: jnp.ndarray, Gt: jnp.ndarray,
                   b: int, d: int) -> jnp.ndarray:
    """Transpose of the direction-b derivative operator."""
    for k in range(d):
        uq = apply_axis(uq, Gt if k == b else Bt, k, d)
    return uq


def eval_gradient_dir(u: jnp.ndarray, B: jnp.ndarray, G: jnp.ndarray,
                      b: int, d: int) -> jnp.ndarray:
    """Direction-b reference derivative at tensor points: (..., q...).

    Component form of eval_gradient that never materializes the stacked
    (..., d) gradient axis — on TPU a trailing size-d axis forces a
    (8,128)-tile layout with up to ~50x padding waste for d=3."""
    for k in range(d):
        u = apply_axis(u, G if k == b else B, k, d)
    return u


def dense_ops(B: jnp.ndarray, G: jnp.ndarray, d: int):
    """Dense dof->qpoint operators from 1D tables: (NQ, nd) matrices.

    Sum-factorization minimizes FLOPs but runs as 3 passes of tiny-axis
    contractions — bandwidth-bound and transpose-heavy on TPU.  At the
    orders Laghos uses (nd <= 125, NQ <= 512) a single dense
    (NE, nd) @ (nd, NQ) matmul per field maps straight onto the MXU and
    wins by ~5x.  Returns (Bd, [Gd_0 .. Gd_{d-1}]) with x the FASTEST
    axis on both the dof and qpoint flat indices (matching the gather
    maps and the flat W ordering).
    """
    import numpy as np

    Bn = np.asarray(B)
    Gn = np.asarray(G)
    Bd = np.ones((1, 1))
    for _ in range(d):
        Bd = np.kron(Bn, Bd)      # x fastest
    Gds = []
    for b in range(d):
        M = np.ones((1, 1))
        for k in range(d):
            M = np.kron(Gn if k == b else Bn, M)
        Gds.append(M)
    return Bd, Gds
