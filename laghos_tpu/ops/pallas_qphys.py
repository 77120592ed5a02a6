"""Pallas-fused pointwise quadrature physics (TPU VPU kernel).

Fuses the ~80-op pointwise physics chain (ops/qphys.py) into a single
VMEM-resident kernel: one read of (J, grad v, Jac0inv, e, mass) per point
and one write of (stress.J^-T, dt, visc) — no HBM round-trips between the
EOS / eigen-solve / viscosity / dt stages.  Production (f32) path; the
f64 parity path stays on the XLA pipeline.

Layout: per-point scalar fields stacked component-major, padded flat
N -> (M, 128) so each program processes a (BM, 128) tile per component.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qphys import physics_3d

_BM = 8  # sublane rows per program


def _kernel(J_ref, dV_ref, J0i_ref, S_ref, sJit_ref, dtq_ref, visc_ref,
            *, h0, h1order, cfl, use_vorticity, hard_visc):
    J = tuple(J_ref[k] for k in range(9))
    dV = tuple(dV_ref[k] for k in range(9))
    J0i = tuple(J0i_ref[k] for k in range(9))
    e_q = S_ref[0]
    rw = S_ref[1]
    winv = S_ref[2]
    sJit, dtq, visc = physics_3d(
        J, dV, J0i, e_q, rw, S_ref[3], winv, h0_e=h0, h1order=h1order,
        cfl=cfl, use_vorticity=use_vorticity, hard_visc=hard_visc)
    for k in range(9):
        sJit_ref[k] = sJit[k]
    dtq_ref[...] = dtq
    visc_ref[...] = visc


def physics_3d_pallas(J, dV, J0i, e_q, rw, gamma, W, *, h0, h1order, cfl,
                      use_vorticity=False, hard_visc=False,
                      interpret=False):
    """J, dV, J0i: (NE, NQ, 3, 3); e_q, rw: (NE, NQ); gamma: (NE,);
    W: (NQ,). Returns (sJit (NE,NQ,3,3), dtq (NE,NQ), visc (NE,NQ))."""
    NE, NQ = e_q.shape
    N = NE * NQ
    M = -(-N // 128)
    Mp = -(-M // _BM) * _BM
    Np = Mp * 128
    dtype = e_q.dtype

    def pack9(A):
        flat = A.reshape(N, 9).T                       # (9, N)
        out = jnp.zeros((9, Np), dtype)
        out = out.at[:, :N].set(flat)
        return out.reshape(9, Mp, 128)

    def pack1(a, fill=0.0):
        out = jnp.full((Np,), fill, dtype)
        out = out.at[:N].set(a.reshape(-1))
        return out.reshape(Mp, 128)

    Jp = pack9(J)
    dVp = pack9(dV)
    J0ip = pack9(J0i)
    gam = jnp.broadcast_to(gamma[:, None], (NE, NQ))
    winv = jnp.broadcast_to((1.0 / W)[None, :], (NE, NQ))
    # padded tail: rw=0, winv=0 -> R=0; e=0; J=I to keep things finite
    Sp = jnp.stack([pack1(e_q), pack1(rw), pack1(winv),
                    pack1(gam, fill=1.4)], axis=0)     # (4, Mp, 128)
    eye = jnp.zeros((9, Mp, 128), dtype)
    for k in (0, 4, 8):
        eye = eye.at[k].set(1.0)
    mask = (jax.lax.broadcasted_iota(
        jnp.int32, (Mp * 128,), 0) < N).reshape(Mp, 128)
    Jp = jnp.where(mask[None], Jp, eye)
    J0ip = jnp.where(mask[None], J0ip, eye)

    grid = (Mp // _BM,)
    # index-map constants must be i32: under x64 mode a python 0 becomes
    # an i64 constant and Mosaic rejects the index function's return type
    zero = np.int32(0)
    spec9 = pl.BlockSpec((9, _BM, 128), lambda i: (zero, i, zero),
                         memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((4, _BM, 128), lambda i: (zero, i, zero),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((_BM, 128), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, h0=h0, h1order=h1order, cfl=cfl,
        use_vorticity=use_vorticity, hard_visc=hard_visc)
    sJit, dtq, visc = pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[spec9, spec9, spec9, spec4],
        out_specs=(spec9, spec1, spec1),
        out_shape=(
            jax.ShapeDtypeStruct((9, Mp, 128), dtype),
            jax.ShapeDtypeStruct((Mp, 128), dtype),
            jax.ShapeDtypeStruct((Mp, 128), dtype),
        ),
    )(Jp, dVp, J0ip, Sp)
    dtq = jnp.where(mask, dtq, jnp.inf)
    sJit_out = sJit.reshape(9, Np)[:, :N].T.reshape(NE, NQ, 3, 3)
    return (sJit_out, dtq.reshape(-1)[:N].reshape(NE, NQ),
            visc.reshape(-1)[:N].reshape(NE, NQ))


def _kernel_flat(*refs, h0, h1order, cfl, use_vorticity, hard_visc):
    (J_refs, dV_refs, J0i_refs) = (refs[0:9], refs[9:18], refs[18:27])
    e_ref, rw_ref, winv_ref, gam_ref = refs[27:31]
    outs = refs[31:]
    sJit, dtq, visc = physics_3d(
        tuple(r[...] for r in J_refs), tuple(r[...] for r in dV_refs),
        tuple(r[...] for r in J0i_refs), e_ref[...], rw_ref[...],
        gam_ref[...], winv_ref[...], h0_e=h0, h1order=h1order, cfl=cfl,
        use_vorticity=use_vorticity, hard_visc=hard_visc)
    for k in range(9):
        outs[k][...] = sJit[k]
    outs[9][...] = dtq
    outs[10][...] = visc


def physics_3d_pallas_flat(J9, dV9, J0i9, e_q, rw, gam, winv, *, h0,
                           h1order, cfl, use_vorticity=False,
                           hard_visc=False, interpret=False):
    """No-packing variant for DENSE q-lattice inputs: all 31 operands
    are same-shaped 2D arrays passed as separate refs (no stack/pad
    copies on either side — the packed layout of physics_3d_pallas9
    cost more in HBM copies than the kernel saved).  Requires
    rows % 8 == 0 (q-lattice rows are multiples of nq1^2)."""
    R, C = e_q.shape
    bm = _BM
    assert R % bm == 0, (R, bm)
    dtype = e_q.dtype
    zero = np.int32(0)
    spec = pl.BlockSpec((bm, C), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    n_in = 31
    kern = functools.partial(
        _kernel_flat, h0=h0, h1order=h1order, cfl=cfl,
        use_vorticity=use_vorticity, hard_visc=hard_visc)
    outs = pl.pallas_call(
        kern,
        grid=(R // bm,),
        interpret=interpret,
        in_specs=[spec] * n_in,
        out_specs=tuple([spec] * 11),
        out_shape=tuple(jax.ShapeDtypeStruct((R, C), dtype)
                        for _ in range(11)),
    )(*J9, *dV9, *J0i9, e_q, rw, winv, gam)
    return tuple(outs[:9]), outs[9], outs[10]


def physics_3d_pallas9(J9, dV9, J0i9, e_q, rw, gamma, W=None, *, h0,
                       h1order, cfl, use_vorticity=False, hard_visc=False,
                       interpret=False, winv=None):
    """Component-tuple variant: J9/dV9/J0i9 are 9-tuples of (NE, NQ);
    gamma broadcastable to (NE, NQ).  Returns (sJit 9-tuple of (NE, NQ),
    dtq, visc) — no trailing (3, 3) matrix dims anywhere (TPU layouts
    would pad them ~57x)."""
    NE, NQ = e_q.shape
    N = NE * NQ
    M = -(-N // 128)
    Mp = -(-M // _BM) * _BM
    Np = Mp * 128
    dtype = e_q.dtype

    def pack9t(t):
        flat = jnp.stack([a.reshape(N) for a in t], axis=0)   # (9, N)
        out = jnp.zeros((9, Np), dtype)
        return out.at[:, :N].set(flat).reshape(9, Mp, 128)

    def pack1(a, fill=0.0):
        out = jnp.full((Np,), fill, dtype)
        return out.at[:N].set(jnp.broadcast_to(a, (NE, NQ)).reshape(-1)
                              ).reshape(Mp, 128)

    Jp = pack9t(J9)
    dVp = pack9t(dV9)
    J0ip = pack9t(J0i9)
    if winv is None:
        winv = jnp.broadcast_to((1.0 / W)[None, :], (NE, NQ))
    Sp = jnp.stack([pack1(e_q), pack1(rw), pack1(winv),
                    pack1(gamma, fill=1.4)], axis=0)
    eye = jnp.zeros((9, Mp, 128), dtype)
    for k in (0, 4, 8):
        eye = eye.at[k].set(1.0)
    mask = (jax.lax.broadcasted_iota(
        jnp.int32, (Mp * 128,), 0) < N).reshape(Mp, 128)
    Jp = jnp.where(mask[None], Jp, eye)
    J0ip = jnp.where(mask[None], J0ip, eye)

    grid = (Mp // _BM,)
    zero = np.int32(0)
    spec9 = pl.BlockSpec((9, _BM, 128), lambda i: (zero, i, zero),
                         memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((4, _BM, 128), lambda i: (zero, i, zero),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((_BM, 128), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, h0=h0, h1order=h1order, cfl=cfl,
        use_vorticity=use_vorticity, hard_visc=hard_visc)
    sJit, dtq, visc = pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[spec9, spec9, spec9, spec4],
        out_specs=(spec9, spec1, spec1),
        out_shape=(
            jax.ShapeDtypeStruct((9, Mp, 128), dtype),
            jax.ShapeDtypeStruct((Mp, 128), dtype),
            jax.ShapeDtypeStruct((Mp, 128), dtype),
        ),
    )(Jp, dVp, J0ip, Sp)
    dtq = jnp.where(mask, dtq, jnp.inf)
    sJit9 = tuple(sJit[k].reshape(Np)[:N].reshape(NE, NQ)
                  for k in range(9))
    return (sJit9, dtq.reshape(-1)[:N].reshape(NE, NQ),
            visc.reshape(-1)[:N].reshape(NE, NQ))
