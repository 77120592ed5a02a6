"""State transfer across AMR events (refine / derefine).

Equivalent of the reference's AMRUpdate + FESpace::GetUpdateOperator
interpolation (amr/laghos.cpp:761-796): H1 fields transfer by polynomial
interpolation (exact on refinement, point-sampling on derefinement), the
L2 energy by exact Bernstein subdivision on refinement and local L2
projection on derefinement.
"""

from __future__ import annotations

import numpy as np

from ..fem import basis as fb
from ..fem import quadrature as fq


class TransferPlan:
    """Per-new-leaf provenance between two forest states."""

    SAME, CHILD, PARENT = 0, 1, 2

    def __init__(self, old_order, new_order, dim):
        old_set = {k: i for i, k in enumerate(old_order)}
        self.dim = dim
        self.entries = []
        for (k, idx) in new_order:
            if (k, idx) in old_set:
                self.entries.append((self.SAME, old_set[(k, idx)], None))
                continue
            parent = (k - 1, tuple(v >> 1 for v in idx))
            if parent in old_set:
                bits = tuple(idx[d] & 1 for d in range(dim))
                self.entries.append((self.CHILD, old_set[parent], bits))
                continue
            # derefined: the 2^dim children were old leaves
            kids = []
            for c in np.ndindex(*(2,) * dim):
                c = tuple(reversed(c))
                cidx = tuple(2 * idx[d] + c[d] for d in range(dim))
                kids.append((c, old_set[(k + 1, cidx)]))
            self.entries.append((self.PARENT, None, kids))


def _tensor_apply(vals, mats, dim):
    """Apply 1D matrices per axis to (..., n^dim)-flattened values."""
    n_in = mats[0].shape[1]
    n_out = mats[0].shape[0]
    lead = vals.shape[:-1]
    out = vals.reshape(lead + (n_in,) * dim)
    for k in range(dim):
        ax = out.ndim - 1 - k
        out = np.moveaxis(np.tensordot(out, mats[k], axes=[[ax], [1]]),
                          -1, ax)
    return out.reshape(lead + (n_out**dim,))


class H1Transfer:
    def __init__(self, p, dim):
        gl = fq.gauss_lobatto(p + 1)
        BL, _ = fb.lagrange_tables(gl, gl / 2.0)
        BR, _ = fb.lagrange_tables(gl, 0.5 + gl / 2.0)
        self.child = (BL, BR)
        # derefinement: parent node from the child containing it
        DL = np.zeros((p + 1, p + 1))
        DR = np.zeros((p + 1, p + 1))
        for a, t in enumerate(gl):
            if t <= 0.5:
                B, _ = fb.lagrange_tables(gl, np.array([2.0 * t]))
                DL[a] = B[0]
            else:
                B, _ = fb.lagrange_tables(gl, np.array([2.0 * t - 1.0]))
                DR[a] = B[0]
        self.parent = (DL, DR)
        self.dim = dim
        self.nd = (p + 1) ** dim

    def element_values(self, plan: TransferPlan, old_evals):
        """old_evals: (C, NE_old, nd) -> (C, NE_new, nd)."""
        C = old_evals.shape[0]
        d = self.dim
        out = np.zeros((C, len(plan.entries), self.nd))
        BL, BR = self.child
        DL, DR = self.parent
        for li, (kind, src, extra) in enumerate(plan.entries):
            if kind == TransferPlan.SAME:
                out[:, li] = old_evals[:, src]
            elif kind == TransferPlan.CHILD:
                mats = [BR if extra[k] else BL for k in range(d)]
                out[:, li] = _tensor_apply(old_evals[:, src], mats, d)
            else:
                acc = np.zeros((C, self.nd))
                for bits, oi in extra:
                    mats = [DR if bits[k] else DL for k in range(d)]
                    acc += _tensor_apply(old_evals[:, oi], mats, d)
                out[:, li] = acc
        return out


class L2Transfer:
    def __init__(self, p, dim):
        # nodal GL basis (the reference AMR build does not use Bernstein:
        # amr/README "Limitations"): refinement = point evaluation of the
        # parent polynomial at the child node positions
        gln, _ = fq.gauss_legendre(p + 1)
        EL, _ = fb.lagrange_tables(gln, gln / 2.0)
        ER, _ = fb.lagrange_tables(gln, 0.5 + gln / 2.0)
        self.child = (EL, ER)
        # derefinement: 1D T_b = 0.5 * Mref^-1 E_b^T Mref
        qx, qw = fq.gauss_legendre(p + 2)
        Bq, _ = fb.lagrange_tables(gln, qx)
        M = np.einsum("qi,qj,q->ij", Bq, Bq, qw)
        Mi = np.linalg.inv(M)
        self.parent = (0.5 * Mi @ EL.T @ M, 0.5 * Mi @ ER.T @ M)
        self.dim = dim
        self.ld = (p + 1) ** dim

    def element_values(self, plan: TransferPlan, old_e):
        """old_e: (NE_old, ld) -> (NE_new, ld)."""
        d = self.dim
        out = np.zeros((len(plan.entries), self.ld))
        EL, ER = self.child
        TL, TR = self.parent
        for li, (kind, src, extra) in enumerate(plan.entries):
            if kind == TransferPlan.SAME:
                out[li] = old_e[src]
            elif kind == TransferPlan.CHILD:
                mats = [ER if extra[k] else EL for k in range(d)]
                out[li] = _tensor_apply(old_e[src][None], mats, d)[0]
            else:
                acc = np.zeros(self.ld)
                for bits, oi in extra:
                    mats = [TR if bits[k] else TL for k in range(d)]
                    acc += _tensor_apply(old_e[oi][None], mats, d)[0]
                out[li] = acc
        return out
