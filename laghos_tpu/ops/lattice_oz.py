"""f64-accurate whole-lattice banded contractions via int8-MXU Ozaki.

Fuses the two round-2 paths: `ops/lattice.py` (banded dof<->qpoint
tables as dense MXU matmuls on raster meshes — the f32 perf
breakthrough) and `ops/omm.py` (integer-slice Ozaki matmuls — the only
way to get f64-class matmul accuracy on a TPU, which has no f64 ALU).

Every hot contraction of the hydro step (mass apply in CG, the nine
velocity/position gradients in qupdate, the force pair) becomes a chain
of per-axis banded matmuls where

  * the STATIC side (the banded basis tables) is split into int8
    slices once at setup (`omm.split_static`),
  * the DYNAMIC side is split once per chain stage and SHARED across
    every table AND every field component that contracts the same
    intermediate (all components ride one batched split — this keeps
    the emitted op-graph ~6x smaller than per-component chains, which
    matters both for speed and for compile-memory at rs4+),
  * each contraction targets the CURRENT axis 1 and lets dot_general
    append the result axis last, so the 3-axis cycle round-trips the
    layout with ZERO transposes of emulated-f64 intermediates.

Reference kernels replaced (perf-wise): the f64 device contractions of
laghos_assembly.cpp:145-514 (MassPA/ForcePA) and the MFEM
QuadratureInterpolator gradients used by QUpdate
(laghos_solver.cpp:1042-1168).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import omm


def build_lattice_oz(B1d, G1d, l2bd, n_zyx, n_slices=omm.S_FULL):
    """Static int8 splits of the per-axis banded tables (both
    orientations) + the dense L2 element tables.

    B1d/G1d: (nq, p+1) 1D H1 value/gradient tables (f64 host arrays);
    l2bd: (NQ, ld) dense d-dim L2 value table; n_zyx: elements per
    lattice axis in (z, y, x) order.
    """
    from . import lattice as lop

    fwdB, bwdB, fwdG, bwdG = [], [], [], []
    for n in n_zyx:
        T = lop.banded_eval_table(np.asarray(B1d, np.float64), n)
        Tg = lop.banded_eval_table(np.asarray(G1d, np.float64), n)
        fwdB.append(omm.split_static(T, n_slices))
        bwdB.append(omm.split_static(T.T, n_slices))
        fwdG.append(omm.split_static(Tg, n_slices))
        bwdG.append(omm.split_static(Tg.T, n_slices))
    l2bd = np.asarray(l2bd, np.float64)
    # no scalar leaves here: the dict rides the Hydro ctx-as-arguments
    # pytree into jits, so the slice count lives in the StaticSplit
    # metadata (_S below), not as a (traced) dict entry
    return {
        "fwdB": tuple(fwdB), "bwdB": tuple(bwdB),
        "fwdG": tuple(fwdG), "bwdG": tuple(bwdG),
        "l2fwd": omm.split_static(l2bd.T, n_slices),
        "l2bwd": omm.split_static(l2bd, n_slices),
    }


def _S(loz):
    """Static slice count of a lattice_oz build."""
    return loz["fwdB"][0].n_slices


def mass_apply_lattice_oz(uL, loz, Dq, lat_dims, n_slices=None):
    """f64-accurate PA mass apply on the raster lattice (the CG-H1
    operator).  uL: (C, ndof); Dq: dense q-lattice rho0DetJ0w.

    Chain: contract axis 1 six times — forward axes cycle
    (C,Lz,Ly,Lx) -> (C,Ly,Lx,Qz) -> (C,Lx,Qz,Qy) -> (C,Qz,Qy,Qx),
    pointwise Dq, then the transpose tables cycle back.

    `n_slices` truncates the dynamic split (and with it the slice-pair
    set) below the build's static count: the IR velocity solve uses 6
    (~2^-42 truncation — three decades below its 1e-8 residual target,
    21 vs 36 MXU products per contraction).

    Splits run through the fused Pallas kernel on TPU (default impl
    dispatch) — measured 47.8 -> 31.4 ms on the full ns2 IR solve.
    """
    C = uL.shape[0]
    S = n_slices or _S(loz)
    q = uL.reshape((C,) + tuple(lat_dims))
    for k in range(3):
        q = omm.tensordot(q, loz["fwdB"][k], axis=1, n_slices=S)
    q = q * Dq[None]
    for k in range(3):
        q = omm.tensordot(q, loz["bwdB"][k], axis=1, n_slices=S)
    return q.reshape(C, -1)


def gradc_lattice_oz(uc, loz, n_slices=None):
    """f64-accurate first derivatives of a batch of lattice fields.

    uc: (C, Lz, Ly, Lx).  Returns (d_x, d_y, d_z), each (C, Qz, Qy,
    Qx), d_b[c] = d uc[c] / d xi_b (b=0 the x direction).  All C
    components ride ONE batched dynamic split per chain stage, and the
    value/gradient tables consuming the same intermediate share it
    (6 splits, 8 slice-matmuls for the whole batch).

    `n_slices` truncates the dynamic splits: the qupdate gradients run
    at 6 (~2^-42 — they only set stress VALUES, at the f64-emulation
    noise floor; force/transpose adjointness, which energy conservation
    rides on, is untouched because both sides consume the same sJit).
    """
    S = n_slices or _S(loz)
    fB, fG = loz["fwdB"], loz["fwdG"]
    # impl="xla": these are reconstruct->split chains where XLA fuses
    # the elementwise cascade into the producing reconstruction; the
    # Pallas kernel is a fusion barrier and measured 3x slower here
    du = omm.split_dyn(uc, S, axis=1, impl="xla")
    tzB = omm.mm(du, fB[0], axis=1)          # (C, Ly, Lx, Qz)
    tzG = omm.mm(du, fG[0], axis=1)
    dB = omm.split_dyn(tzB, S, axis=1, impl="xla")
    tBB = omm.mm(dB, fB[1], axis=1)          # (C, Lx, Qz, Qy)
    tBG = omm.mm(dB, fG[1], axis=1)
    dG = omm.split_dyn(tzG, S, axis=1, impl="xla")
    tGB = omm.mm(dG, fB[1], axis=1)
    d_x = omm.tensordot(tBB, fG[2], axis=1, n_slices=S,
                        split_impl="xla")    # (C, Qz, Qy, Qx)
    d_y = omm.tensordot(tBG, fB[2], axis=1, n_slices=S,
                        split_impl="xla")
    d_z = omm.tensordot(tGB, fB[2], axis=1, n_slices=S,
                        split_impl="xla")
    return d_x, d_y, d_z


def grad9_lattice_oz(u3, loz, n_slices=None):
    """9-tuple J[a*3+b] = d u_a / d xi_b (ops/lattice.grad9_lattice
    layout) from one batched gradc chain."""
    d_x, d_y, d_z = gradc_lattice_oz(u3, loz, n_slices=n_slices)
    return tuple(d[a] for a in range(3) for d in (d_x, d_y, d_z))


def grad18_lattice_oz(x3, v3, loz, n_slices=6):
    """(J9, dV9) for qupdate: both vector fields stacked through ONE
    batched chain (halves the splits and slice-matmuls vs two calls)."""
    d_x, d_y, d_z = gradc_lattice_oz(jnp.concatenate([x3, v3], axis=0),
                                     loz, n_slices=n_slices)
    J9 = tuple(d[a] for a in range(3) for d in (d_x, d_y, d_z))
    dV9 = tuple(d[3 + a] for a in range(3) for d in (d_x, d_y, d_z))
    return J9, dV9


def force_one_lattice_oz(sJ, loz, n_slices=None):
    """f64-accurate (F . 1) on the H1 lattice from q-lattice stress.

    sJ: 9-tuple sJit[gd*3+vd]; returns (3, Lz, Ly, Lx).  For each
    reference direction gd the three velocity components share one
    batched transpose chain (9 splits / 9 slice-matmuls total).

    `n_slices` truncates the dynamic splits below the build's static
    count (Options.ozaki_rhs_slices): 7 puts the per-stage truncation
    at ~2^-49 — the double-float emulation noise floor itself — for
    28 vs 36 level-dots per contraction."""
    S = n_slices or _S(loz)
    bB, bG = loz["bwdB"], loz["bwdG"]
    acc = None
    for gd in range(3):
        s = jnp.stack([sJ[gd * 3 + vd] for vd in range(3)], axis=0)
        Tz = bG[0] if gd == 2 else bB[0]
        Ty = bG[1] if gd == 1 else bB[1]
        Tx = bG[2] if gd == 0 else bB[2]
        t = omm.tensordot(s, Tz, axis=1, n_slices=S,
                          split_impl="xla")  # (3, Qy, Qx, Lz)
        t = omm.tensordot(t, Ty, axis=1, n_slices=S,
                          split_impl="xla")  # (3, Qx, Lz, Ly)
        t = omm.tensordot(t, Tx, axis=1, n_slices=S,
                          split_impl="xla")  # (3, Lz, Ly, Lx)
        acc = t if acc is None else acc + t
    return acc


def l2_eval_oz(e_b, loz, n_slices=None):
    """(NE, ld) L2 dofs -> (NE, NQ) qpoint values, f64-accurate."""
    return omm.matmul(e_b, loz["l2fwd"], n_slices or _S(loz),
                      split_impl="xla")


def l2_transpose_oz(eq, loz, n_slices=None):
    """(NE, NQ) qpoint integrand -> (NE, ld) L2 rhs, f64-accurate."""
    return omm.matmul(eq, loz["l2bwd"], n_slices or _S(loz),
                      split_impl="xla")
