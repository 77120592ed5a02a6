"""Shared-split Ozaki (int8-MXU) matmuls for the f64 hot contractions.

TPU has no f64 ALU: XLA emulates f64 on the VPU and every f64 matmul
stays off the MXU.  `ops/ozaki.py` validated the integer-slice scheme;
this module is its production form for the FEM contraction sites, where

  * one side (the basis operator, e.g. dense (NQ, nd) tables) is STATIC:
    split once at setup, all-zero slices dropped,
  * the dynamic side (state E-vectors, q-data) is split once per call
    and SHARED across several matmuls (e.g. x_e feeds d gradient
    directions),
  * slice-pair products run as int8 x int8 -> int32 `dot_general`s on
    the MXU (exact), grouped by significance level for the f64
    reconstruction.

Error bound: with q=7 bits/slice and S=8 levels, the result matches the
f64 product to ~2^-56 relative to the per-row/column maxima — at or
below the rounding error of an f64 dot product itself.

Reference kernels being replaced (perf-wise): the f64 device contractions
of laghos_assembly.cpp:145-514 / MFEM QuadratureInterpolator.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Q = 7          # bits per slice
S_FULL = 8     # slices for full-f64 accuracy


@dataclasses.dataclass(frozen=True)
class StaticSplit:
    """Pre-split static operand B (k, n): contraction dim FIRST."""

    slices: tuple          # tuple of (k, n) int8 arrays, level-indexed
    levels: tuple          # slice level t of each entry (zero slices dropped)
    scale: jnp.ndarray     # (n,) f64: 2^{eB}
    e: np.ndarray          # (n,) int exponents
    n_slices: int


def split_static(B: np.ndarray, n_slices: int = S_FULL) -> StaticSplit:
    """Exact per-column power-of-2 scaling + q-bit slices (host, f64)."""
    B = np.asarray(B, np.float64)
    mx = np.max(np.abs(B), axis=0, keepdims=True)
    mx = np.where(mx == 0.0, 1.0, mx)
    # |B| * 2^-e <= 1/2 so round-to-nearest keeps slice 0 <= 2^(Q-1):
    # floor(log2)+1 would leave m in (1/2, 1] and round(m*2^Q) can hit
    # 2^Q, overflowing int8
    e = np.ceil(np.log2(mx)) + 1.0
    m = B * np.exp2(-e)
    slices, levels = [], []
    r = m
    for t in range(n_slices):
        d = np.round(r * (2.0 ** Q))
        r = r * (2.0 ** Q) - d
        if np.any(d != 0.0):
            slices.append(jnp.asarray(d.astype(np.int8)))
            levels.append(t)
    return StaticSplit(tuple(slices), tuple(levels),
                       jnp.asarray(np.exp2(e[0])), e[0], n_slices)


@dataclasses.dataclass(frozen=True)
class DynSplit:
    """Split dynamic operand A (..., k): contraction dim LAST."""

    slices: tuple          # n_slices arrays (..., k) int8
    scale: jnp.ndarray     # (..., 1) f64: 2^{eA}
    n_slices: int


def split_dyn(A: jnp.ndarray, n_slices: int = S_FULL) -> DynSplit:
    """Per-row power-of-2 scaling + q-bit integer slices (on device)."""
    mx = jnp.max(jnp.abs(A), axis=-1, keepdims=True)
    mx = jnp.where(mx == 0.0, 1.0, mx)
    # frexp-free exponent: |A| * 2^-e <= 1/2 guarantees round-to-nearest
    # keeps every slice magnitude <= 2^(Q-1) — no int8 clipping.  ceil,
    # not floor: floor+1 leaves m in (1/2, 1] and slice 0 can hit 2^Q.
    e = jnp.ceil(jnp.log2(mx)) + 1.0
    m = A * jnp.exp2(-e)
    slices = []
    r = m
    for _ in range(n_slices):
        d = jnp.round(r * (2.0 ** Q))
        r = r * (2.0 ** Q) - d
        slices.append(d.astype(jnp.int8))
    return DynSplit(tuple(slices), jnp.exp2(e), n_slices)


def _dot_i8(a, b):
    """(..., k) int8 @ (k, n) int8 -> (..., n) int32 on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def mm(dyn: DynSplit, st: StaticSplit) -> jnp.ndarray:
    """f64-accurate dyn @ st from int8 slice-pair MXU products.

    Truncates to slice pairs s + t < n_slices (same bound as a full-f64
    product when n_slices = 8, q = 7)."""
    S = dyn.n_slices
    by_level = {}
    for t, bs in zip(st.levels, st.slices):
        for s in range(S - t):
            c = _dot_i8(dyn.slices[s], bs)
            L = s + t
            by_level[L] = c if L not in by_level else by_level[L] + c
    acc = None
    for L in sorted(by_level, reverse=True):
        term = by_level[L].astype(jnp.float64) * (2.0 ** (-Q * (L + 2)))
        acc = term if acc is None else acc + term
    return acc * dyn.scale * st.scale


def matmul(A, B_static: StaticSplit, n_slices: int = S_FULL):
    """One-shot A (..., k) @ B (k, n) with a fresh dynamic split."""
    return mm(split_dyn(A, n_slices), B_static)
