"""Fused double-float qupdate physics as a Pallas TPU kernel.

The f64-accurate (ozaki) mode's pointwise physics chain
(ops/qphys.physics_3d) measured ~30 ms at the ns2 q-lattice under
XLA's f64 emulation — 10x over the memory roofline, because every
fusion boundary round-trips emulated-f64 intermediates through HBM.
This kernel keeps the whole chain VMEM-resident in explicit two-f32
double-float arithmetic (ops/df64, ops/qphys_df64): one HBM read of
(J, grad v, statics, e), one write of (stress.J^-T, dtq) per point.

Accuracy is the same ~2^-48 double-float class as XLA's own f64
emulation on TPU, so the ozaki mode's accuracy claim is unchanged; the
CPU (native f64) paths never use this kernel, keeping the golden /
--checks gates on real f64.

Reference counterpart (perf-wise): the QUpdate device kernel of
laghos_solver.cpp:1042-1168.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64 as df
from . import qphys_df64

# static field order in the packed (N_STAT, 2, R, C) bundle
_STAT_FIELDS = ("J0i0", "J0i1", "J0i2", "J0i3", "J0i4", "J0i5",
                "J0i6", "J0i7", "J0i8", "rww", "gm1", "gg1", "w", "h0e")
N_STAT = len(_STAT_FIELDS)


def build_df_stat(J0i9, rw, gam, winv, h0e):
    """Pack the run-constant physics fields into one (N_STAT, 2, R, C)
    f32 hi/lo bundle (split ONCE at setup).

    J0i9: 9-tuple of (Qz, Qy, Qx) f64; rw (rho0DetJ0w), gam, winv
    (1/w_q), h0e: (Qz, Qy, Qx) f64 q-lattice fields.  Precombines
    rww = rw*winv, gm1 = gam-1, gg1 = gam*(gam-1), w = 1/winv so the
    kernel never spends df64 ops on them.
    """
    fields = list(J0i9) + [rw * winv, gam - 1.0, gam * (gam - 1.0),
                           1.0 / winv, h0e]
    R, C = _rc(fields[0].shape)
    out = []
    for f in fields:
        hi, lo = df.from_f64(jnp.asarray(f, jnp.float64).reshape(R, C))
        out.append(jnp.stack([hi, lo]))
    return jnp.stack(out)          # (N_STAT, 2, R, C) f32


def _rc(shape):
    """(Qz, Qy, Qx) or (R, C) -> 2D row/col split keeping the minor
    axis as lanes."""
    if len(shape) == 1:
        return 1, shape[0]
    C = shape[-1]
    R = 1
    for s in shape[:-1]:
        R *= s
    return R, C


def _kernel(stat_ref, *refs, h1order, cfl, use_viscosity, use_vorticity,
            hard_visc, eig_sweeps, n_out):
    ins = refs[:-n_out]
    outs = refs[-n_out:]
    # dynamic operands arrive as separate hi/lo refs: 9 J + 9 dV + e
    Jd = tuple((ins[2 * k][...], ins[2 * k + 1][...]) for k in range(9))
    dVd = tuple((ins[18 + 2 * k][...], ins[19 + 2 * k][...])
                for k in range(9))
    e_d = (ins[36][...], ins[37][...])
    st = {name: (stat_ref[i, 0], stat_ref[i, 1])
          for i, name in enumerate(_STAT_FIELDS)}
    J0id = tuple(st[f"J0i{k}"] for k in range(9))
    sJit, dtq, _ = qphys_df64.physics_3d_df(
        Jd, dVd, J0id, e_d, st["rww"], st["gm1"], st["gg1"], st["w"],
        st["h0e"], h1order=h1order, cfl=cfl,
        use_viscosity=use_viscosity, use_vorticity=use_vorticity,
        hard_visc=hard_visc, eig_sweeps=eig_sweeps)
    for k in range(9):
        outs[k][0], outs[k][1] = sJit[k]
    outs[9][0], outs[9][1] = dtq


def physics_3d_pallas_df64(J9, dV9, df_stat, e_q, *, h1order, cfl,
                           use_viscosity=True, use_vorticity=False,
                           hard_visc=False, eig_sweeps=4, bm=64,
                           interpret=False):
    """Fused df64 physics: J9/dV9 9-tuples of f64 q-lattice arrays,
    df_stat the build_df_stat bundle, e_q f64.  Returns (sJit 9-tuple
    f64, dtq f64) in the input shape.

    The dynamic operands are hi/lo-split outside (two cheap XLA passes
    each); statics were split once at setup.
    """
    shape = e_q.shape
    R, C = _rc(shape)
    while bm > 1 and R % bm:
        bm //= 2
    assert R % bm == 0

    def pair(a):
        return df.from_f64(jnp.asarray(a, jnp.float64).reshape(R, C))

    dyn = []
    for a in J9:
        dyn.extend(pair(a))
    for a in dV9:
        dyn.extend(pair(a))
    dyn.extend(pair(e_q))

    zero = np.int32(0)
    spec = pl.BlockSpec((bm, C), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    spec_stat = pl.BlockSpec((N_STAT, 2, bm, C),
                             lambda i: (zero, zero, i, zero),
                             memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((2, bm, C), lambda i: (zero, i, zero),
                            memory_space=pltpu.VMEM)
    n_out = 10
    kern = functools.partial(
        _kernel, h1order=h1order, cfl=cfl, use_viscosity=use_viscosity,
        use_vorticity=use_vorticity, hard_visc=hard_visc,
        eig_sweeps=eig_sweeps, n_out=n_out)
    outs = pl.pallas_call(
        kern,
        grid=(R // bm,),
        interpret=interpret,
        in_specs=[spec_stat] + [spec] * len(dyn),
        out_specs=tuple([spec_out] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((2, R, C), jnp.float32)
                        for _ in range(n_out)),
    )(df_stat, *dyn)

    def rec(p):
        return (p[0].astype(jnp.float64)
                + p[1].astype(jnp.float64)).reshape(shape)

    sJit9 = tuple(rec(outs[k]) for k in range(9))
    dtq = rec(outs[9])
    return sJit9, dtq


def physics_3d_df64(J9, dV9, J0i9, e_q, rw, gam, winv, h0e, *, h1order,
                    cfl, use_viscosity=True, use_vorticity=False,
                    hard_visc=False, eig_sweeps=4, bm=64,
                    interpret=False):
    """Drop-in image of qphys.physics_3d's (J, dV, J0i, e, rw, gam,
    winv, h0_e) signature that runs the fused df64 Pallas kernel.

    The static fields are hi/lo-split on the fly (cheap elementwise
    passes, ~3% of the kernel's win at ns2) so call sites that carry
    the plain f64 q-lattice constants — the conforming lattice path and
    the per-block slab/pencil closures — need no setup-time plumbing.
    Returns (sJit9 f64 tuple, dtq f64) like qphys.physics_3d minus the
    visc array (no caller of the oz branch consumes it).
    """
    stat = build_df_stat(J0i9, rw, gam, winv, h0e)
    return physics_3d_pallas_df64(
        J9, dV9, stat, e_q, h1order=h1order, cfl=cfl,
        use_viscosity=use_viscosity, use_vorticity=use_vorticity,
        hard_visc=hard_visc, eig_sweeps=eig_sweeps, bm=bm,
        interpret=interpret)


def df64_mode(opt_val):
    """Resolve an Options.df64_qphys value ("auto"/"on"/"off") to
    None (don't use the kernel) or a dict {"interpret": bool}.

    "auto": kernel on every non-CPU backend (TPU-class), native-f64
    XLA on CPU (where real f64 hardware beats interpret mode by far).
    "on": kernel everywhere — interpret-mode on CPU (slow; for tests).
    """
    import jax

    if opt_val == "off":
        return None
    cpu = jax.default_backend() == "cpu"
    if opt_val == "on":
        return {"interpret": cpu}
    return None if cpu else {"interpret": False}
