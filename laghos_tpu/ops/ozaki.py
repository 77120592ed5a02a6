"""f64-accurate matmuls from int8 MXU passes (Ozaki-style splitting).

TPU has no f64 ALU: XLA emulates f64 on the VPU at ~1/20 of f32 throughput
and keeps every contraction off the MXU.  This module implements the
integer-slice (Ozaki) scheme instead: each f64 operand is decomposed into
q-bit integer slices with per-row/column power-of-two exponents,

    A[i,:] = 2^{eA_i} * sum_s  A_s[i,:] * 2^{-q(s+1)},   A_s int8,

slice-pair products run as int8 x int8 -> int32 MXU matmuls (EXACT: bit
products <= 2^{2q}, k-accumulation fits int32 for k < 2^{31-2q}), and the
f64 result is reconstructed from the int32 partial sums.  Truncating to
slice pairs with s+t < S reproduces >= q*S mantissa bits; S=8, q=7 gives
~2^-53 (full f64), S=4 gives ~f32x2 quality at a quarter the passes.

This is the planned round-2 backend for the force/interpolation
contractions (the FLOP-dominant kernels at high order); here it ships as a
standalone validated op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Q = 7  # bits per slice (int8 magnitudes <= 2^7)


def _split(A, n_slices, axis):
    """Per-vector power-of-2 scaling + q-bit integer slices.

    Returns (slices int8 (n_slices, *A.shape), exponents (len along axis)).
    """
    mx = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    mx = jnp.where(mx == 0.0, 1.0, mx)
    # exponent such that |A| * 2^-e <= 1/2: first slice magnitude <= 64,
    # and round-to-nearest keeps every residual slice <= 64 too — no int8
    # clipping anywhere, so the decomposition is exact.  ceil, not floor:
    # floor+1 leaves m in (1/2, 1] and round(m*2^Q) can hit 2^Q = 128,
    # overflowing int8 (observed as a 2^-Q relative error on rows whose
    # max sits within 0.4% below a power of two).
    e = jnp.ceil(jnp.log2(mx)) + 1.0
    m = A * jnp.exp2(-e)
    outs = []
    r = m
    for s in range(n_slices):
        d = jnp.round(r * (2.0**Q))
        outs.append(d.astype(jnp.int8))
        r = r * (2.0**Q) - d
    return jnp.stack(outs), e


def matmul_f64(A, B, n_slices: int = 8):
    """C = A @ B with f64-class accuracy from int8 integer matmuls.

    A: (m, k) f64, B: (k, n) f64.  Uses slice pairs with s+t < n_slices.
    """
    As, eA = _split(A, n_slices, axis=1)      # (S, m, k), (m, 1)
    Bs, eB = _split(B, n_slices, axis=0)      # (S, k, n), (1, n)

    # Partial products grouped by significance level L = s+t; within a
    # level the int32 partials add EXACTLY, and the final f64 accumulation
    # runs smallest level first to minimize rounding.
    by_level = {}
    for s in range(n_slices):
        for t in range(n_slices - s):
            c = jax.lax.dot_general(
                As[s], Bs[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            L = s + t
            by_level[L] = c if L not in by_level else by_level[L] + c
    acc = jnp.zeros(A.shape[:1] + B.shape[1:], jnp.float64)
    for L in sorted(by_level, reverse=True):
        acc = acc + by_level[L].astype(jnp.float64) * (2.0 ** (-Q * (L + 2)))
    return acc * jnp.exp2(eA + eB)


def matmul_f64_batched(A, B, n_slices: int = 8):
    """Batched variant: A (..., m, k) @ B (k, n) — the shape of the
    sum-factorized FEM contractions (elements batched, tiny k)."""
    lead = A.shape[:-1]
    out = matmul_f64(A.reshape(-1, A.shape[-1]), B, n_slices)
    return out.reshape(lead + (B.shape[-1],))
