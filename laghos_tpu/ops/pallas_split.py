"""Fused Pallas TPU kernel for the Ozaki dynamic-operand split.

`omm.split_dyn` is the hidden cost center of every Ozaki chain: profiled
at ns2 scale it runs ~40x over its memory roofline (1.6 ms for a 17 MB
q-lattice array) because the exact round/residual cascade is ~25
emulated-f64/f32 elementwise passes that XLA materializes around the
concatenate.  Per force-pair call there are ~9 splits — more time than
the int8 MXU dots they feed.

This kernel performs the identical cascade VMEM-resident: one read of
the operand (as an exact hi/lo/lo2 three-f32 decomposition, carrying all
53 f64 mantissa bits), one write of the concatenated int8 slices and the
per-row exponent.  The slice/exponent pair is self-consistent by
construction (the per-row scaling is exact power-of-2 arithmetic and the
carry renormalization bounds every slice to int8 range, omm.py:106-152),
so downstream `omm.mm` reconstruction is unchanged.  The exponent choice
may differ from the XLA path's by one ulp of log2 — both are valid
splits; CPU paths (goldens, --checks) keep the XLA implementation, the
TPU production paths opt in via omm.split_dyn's dispatch.

Reference counterpart (perf-wise): the f64 device contractions this
feeds replace laghos_assembly.cpp:145-514 / MFEM QuadratureInterpolator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q = 7


def _kernel(hi_ref, lo_ref, lo2_ref, cat_ref, e_ref, *, n_slices, k):
    hi = hi_ref[0]
    lo = lo_ref[0]
    lo2 = lo2_ref[0]
    f32 = jnp.float32
    # per-row (contraction-axis) scaling exponent: |A * 2^-e| <= 1/2
    # guaranteed by the explicit bound check (log2 rounding can't
    # overflow a slice), all-zero rows pinned to a harmless e
    mx = jnp.max(jnp.abs(hi), axis=0, keepdims=True)
    mx = jnp.where(mx == 0.0, f32(1.0), mx)
    e = jnp.floor(jnp.log2(mx)) + f32(2.0)
    # 2^-e via exponent-bit construction: XLA's f32 exp2 approximates
    # through exp and is NOT exact even on integer arguments (measured
    # 2^-26 off by 1e-6 relative on CPU), which silently breaks the
    # exactness the whole cascade rests on
    sc = jax.lax.bitcast_convert_type(
        (f32(127.0) - e).astype(jnp.int32) << 23, jnp.float32)
    over = mx * sc > f32(0.5)
    e = e + over.astype(f32)
    sc = jnp.where(over, sc * f32(0.5), sc)
    TQ = f32(2.0 ** Q)
    lev = [jnp.zeros(hi.shape, f32) for _ in range(n_slices)]
    # cascade each exact f32 component from its significance level
    # (omm.split_dyn:135-143): power-of-2 scaling, round, and
    # small-integer subtraction are all exact in native f32
    for v, start in ((hi, 0), (lo, 3), (lo2, 6)):
        v = (v * sc) * f32(2.0 ** (Q * (start + 1)))
        for t in range(start, n_slices):
            d = jnp.round(v)
            lev[t] = lev[t] + d
            v = (v - d) * TQ
    # carry renormalization into int8 range (exact, ratio 2^Q)
    for t in range(n_slices - 1, 0, -1):
        c = jnp.round(lev[t] * f32(2.0 ** (-Q)))
        lev[t] = lev[t] - c * TQ
        lev[t - 1] = lev[t - 1] + c
    for t in range(n_slices):
        cat_ref[0, t * k:(t + 1) * k, :] = lev[t].astype(jnp.int8)
    e_ref[0] = e


def exact_pow2(e, dtype=jnp.float64):
    """Exact 2^e for integer-valued f32 `e`, |e| <= 252.

    jnp.exp2 routes through XLA's exp approximation and is NOT exact
    even on integer arguments (measured ~6 ulp off at 2^24 in f64 on
    CPU); a power of two must be built from exponent bits.  Two f32
    factors cover the f64 exponent range; their product is exact."""
    ei = e.astype(jnp.int32)
    e1 = ei >> 1
    e2 = ei - e1

    def p2(x):
        return jax.lax.bitcast_convert_type((x + 127) << 23, jnp.float32)

    return p2(e1).astype(dtype) * p2(e2).astype(dtype)


def split_cat_pallas(A, n_slices, axis, *, bc=256, interpret=False):
    """(cat int8, e f32) of the exact q-bit slice split of f64 `A` over
    `axis` — the Pallas image of omm.split_dyn's (cat, log2(scale)).

    cat has A's shape with dim `axis` widened to n_slices*k (level-major
    concatenation); e has that dim = 1.  Requires |A| within f32
    exponent range (every FEM operand here is).
    """
    ax = axis % A.ndim
    shape = A.shape
    k = shape[ax]
    R1 = int(np.prod(shape[:ax], dtype=np.int64)) if ax else 1
    R2 = int(np.prod(shape[ax + 1:], dtype=np.int64)) if ax < A.ndim - 1 \
        else 1
    A3 = A.reshape(R1, k, R2)
    # exact three-f32 decomposition (all 53 mantissa bits): each
    # extraction rounds once and subtracts a representable nearby value
    hi = A3.astype(jnp.float32)
    rem = A3 - hi.astype(A.dtype)
    lo = rem.astype(jnp.float32)
    lo2 = (rem - lo.astype(A.dtype)).astype(jnp.float32)

    bc = min(bc, R2)
    grid = (R1, pl.cdiv(R2, bc))
    zero = np.int32(0)
    spec_in = pl.BlockSpec((1, k, bc), lambda i, j: (i, zero, j),
                           memory_space=pltpu.VMEM)
    spec_cat = pl.BlockSpec((1, n_slices * k, bc),
                            lambda i, j: (i, zero, j),
                            memory_space=pltpu.VMEM)
    spec_e = pl.BlockSpec((1, 1, bc), lambda i, j: (i, zero, j),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, n_slices=n_slices, k=k)
    cat, e = pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[spec_in, spec_in, spec_in],
        out_specs=(spec_cat, spec_e),
        out_shape=(jax.ShapeDtypeStruct((R1, n_slices * k, R2), jnp.int8),
                   jax.ShapeDtypeStruct((R1, 1, R2), jnp.float32)),
    )(hi, lo, lo2)
    cat = cat.reshape(shape[:ax] + (n_slices * k,) + shape[ax + 1:])
    e = e.reshape(shape[:ax] + (1,) + shape[ax + 1:])
    return cat, e
