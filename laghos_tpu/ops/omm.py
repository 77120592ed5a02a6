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
    """Pre-split static operand B (k, n): contraction dim FIRST.

    Registered as a jax pytree (arrays = leaves, levels/exponents =
    static metadata) so splits can ride the Hydro ctx-as-arguments
    convention into jitted programs instead of being baked in as HLO
    constants."""

    slices: tuple          # tuple of (k, n) int8 arrays, level-indexed
    levels: tuple          # slice level t of each entry (zero slices dropped)
    scale: jnp.ndarray     # (n,) f64: 2^{eB}
    e: tuple               # (n,) int exponents (static metadata)
    n_slices: int
    # stacks[L] = ((L+1)k, n) int8: [b_L; b_{L-1}; ...; b_0] stacked on
    # the contraction axis, so ALL slice pairs of significance level L
    # (s + t = L) reduce inside ONE MXU dot against the dynamic prefix
    # [d_0; ...; d_L] — the per-pair int32 accumulate passes (a large
    # HBM cost at lattice sizes) disappear into the matmul.
    stacks: tuple = ()


jax.tree_util.register_dataclass(
    StaticSplit, data_fields=("slices", "scale", "stacks"),
    meta_fields=("levels", "e", "n_slices"))


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
    dense = []
    r = m
    for t in range(n_slices):
        d = np.round(r * (2.0 ** Q))
        r = r * (2.0 ** Q) - d
        dense.append(d.astype(np.int8))
        if np.any(d != 0.0):
            slices.append(jnp.asarray(d.astype(np.int8)))
            levels.append(t)
    stacks = tuple(
        jnp.asarray(np.concatenate(dense[L::-1], axis=0))
        for L in range(n_slices))
    return StaticSplit(tuple(slices), tuple(levels),
                       jnp.asarray(np.exp2(e[0])),
                       tuple(float(x) for x in e[0]), n_slices,
                       stacks)


@dataclasses.dataclass(frozen=True)
class DynSplit:
    """Split dynamic operand A (..., k): contraction dim LAST."""

    slices: tuple          # n_slices arrays (..., k) int8
    scale: jnp.ndarray     # (..., 1) f64: 2^{eA}
    n_slices: int
    cat: jnp.ndarray = None  # (..., n_slices*k) int8: slices
                             # concatenated on the contraction axis —
                             # level-L dots read the [0:(L+1)k] prefix
                             # in place (no per-level copies)


_PALLAS_SPLIT = None     # lazy: None = unresolved, else bool


def _use_pallas_split() -> bool:
    """Whether split_dyn runs as the fused Pallas kernel
    (ops/pallas_split).  Env LAGHOS_PALLAS_SPLIT: "0"/"off" forces the
    XLA path, "1"/"on" forces the kernel, default "auto" = kernel on
    TPU-class backends, XLA on CPU (native f64 + no Mosaic)."""
    global _PALLAS_SPLIT
    if _PALLAS_SPLIT is None:
        import os

        v = os.environ.get("LAGHOS_PALLAS_SPLIT", "auto").lower()
        if v in ("0", "off"):
            _PALLAS_SPLIT = False
        elif v in ("1", "on"):
            _PALLAS_SPLIT = True
        else:
            _PALLAS_SPLIT = jax.default_backend() != "cpu"
    return _PALLAS_SPLIT


def split_dyn(A: jnp.ndarray, n_slices: int = S_FULL,
              axis: int = -1, impl: str = None) -> DynSplit:
    """Per-row power-of-2 scaling + q-bit integer slices (on device).

    `impl`: None defers to _use_pallas_split (the fused Pallas kernel
    on TPU backends); "xla" forces this XLA form — measured FASTER for
    splits of intermediates inside reconstruct->split chains (force,
    gradients), where XLA fuses the elementwise cascade into the
    producing reconstruction and pallas_call would be a fusion barrier;
    "pallas" forces the kernel (standalone splits of operator inputs:
    the IR residual mass applies, where it wins ~35%).

    The round/residual cascade must be EXACT: on TPU, f64 arithmetic is
    emulated as double-float, whose round() is not exactly rounded —
    residuals escape [-1/2, 1/2] and slices overflow int8 (observed as
    ~1e-3 product errors).  So the scaled mantissa is first decomposed
    into f32 components m = hi + lo + lo2 (each extraction exact: the
    conversion rounds, the f64 subtraction of a representable nearby
    value is exact), and each component is cascaded in NATIVE f32
    arithmetic, where power-of-2 scaling, round(), and small-integer
    subtraction are all exact.  A final carry pass re-normalizes the
    combined per-level sums into int8 range (adjacent levels differ by
    2^Q, so moving +-2^Q down a level to +-1 up a level is exact).
    """
    use_pallas = (_use_pallas_split() if impl is None
                  else impl == "pallas")
    if A.dtype == jnp.float64 and use_pallas:
        from . import pallas_split

        cat, e = pallas_split.split_cat_pallas(A, n_slices, axis)
        ax = axis % A.ndim
        k = A.shape[ax]
        slices = tuple(
            jax.lax.slice_in_dim(cat, t * k, (t + 1) * k, axis=ax)
            for t in range(n_slices))
        return DynSplit(slices, pallas_split.exact_pow2(e, A.dtype),
                        n_slices, cat)
    mx = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    mx = jnp.where(mx == 0.0, 1.0, mx)
    # |A| * 2^-e <= 1/2 (ceil, not floor+1: floor+1 leaves m in (1/2, 1]
    # and slice 0 could hit 2^Q).  A log2 off-by-rounding only shifts m
    # by 2x either way — the carry pass keeps slices in range regardless.
    e = jnp.ceil(jnp.log2(mx)) + 1.0
    m = A * jnp.exp2(-e)
    f64 = A.dtype
    hi = m.astype(jnp.float32)
    rem = m - hi.astype(f64)
    lo = rem.astype(jnp.float32)
    lo2 = (rem - lo.astype(f64)).astype(jnp.float32)
    TQ = jnp.float32(2.0 ** Q)
    lev = [jnp.zeros(A.shape, jnp.float32) for _ in range(n_slices)]
    # component start levels: |lo| <= ulp32(hi)/2 <= 2^-26 sits at level
    # 3 (weight 2^-28) with first round <= 4; |lo2| <= 2^-50 at level 6.
    for v, start in ((hi, 0), (lo, 3), (lo2, 6)):
        v = v * jnp.float32(2.0 ** (Q * (start + 1)))
        for t in range(start, n_slices):
            d = jnp.round(v)
            lev[t] = lev[t] + d
            v = (v - d) * TQ
    # carry renormalization: per-level sums are <= 64 + 64 = 128; fold
    # the overflow into the level above (exact, ratio 2^Q)
    for t in range(n_slices - 1, 0, -1):
        c = jnp.round(lev[t] * jnp.float32(2.0 ** (-Q)))
        lev[t] = lev[t] - c * TQ
        lev[t - 1] = lev[t - 1] + c
    slices = tuple(d.astype(jnp.int8) for d in lev)
    cat = jnp.concatenate(slices, axis=axis)
    return DynSplit(slices, jnp.exp2(e), n_slices, cat)


def _dot_i8(a, b, axis=-1):
    """int8 contraction of `a` axis `axis` with b (k, n) int8 -> int32
    on the MXU; the n axis lands LAST (tensordot semantics)."""
    ax = axis % a.ndim
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((ax,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def mm(dyn: DynSplit, st: StaticSplit, axis: int = -1) -> jnp.ndarray:
    """f64-accurate dyn @ st from int8 slice-pair MXU products.

    `axis` selects the contraction axis of the dynamic operand (must
    match the `axis` the split was taken over); the static side's free
    axis lands last, like jnp.tensordot(A, B, axes=[[axis], [0]]).
    Truncates to slice pairs s + t < n_slices (same bound as a full-f64
    product when n_slices = 8, q = 7)."""
    S = dyn.n_slices
    by_level = {}
    if st.stacks:
        # level-stacked form: one MXU dot per significance level — the
        # (L+1) slice-pair products of level L reduce inside the matmul
        # (same int32 magnitudes as the pairwise sum, so the
        # reconstruction bounds below are unchanged)
        ax = axis % dyn.slices[0].ndim
        kk = dyn.slices[0].shape[ax]
        for L in range(S):
            if dyn.cat is not None:
                d = jax.lax.slice_in_dim(dyn.cat, 0, (L + 1) * kk,
                                         axis=ax)
            else:
                d = (dyn.slices[0] if L == 0 else
                     jnp.concatenate(dyn.slices[:L + 1], axis=ax))
            by_level[L] = _dot_i8(d, st.stacks[L], axis)
    else:
        for t, bs in zip(st.levels, st.slices):
            for s in range(S - t):
                c = _dot_i8(dyn.slices[s], bs, axis)
                L = s + t
                by_level[L] = c if L not in by_level else by_level[L] + c
    # Reconstruction: emulated-f64 passes over (M, n) are the dominant
    # cost.  Three cuts keep accuracy at the 2^-56 truncation / 2^-49
    # double-float noise floor while minimizing them:
    #   * levels >= 4 (weight <= 2^-42) accumulate in f32: the 2^-24
    #     conversion error lands ~2^-50 relative to the result;
    #   * levels (0,1) and (2,3) pair EXACTLY in int32 space
    #     (S_lo + 2^Q S_hi) when the bound (L+1) k 2^(12+Q) < 2^31
    #     guarantees no overflow — halving the f64 passes;
    #   * the f32 tail folds in with a single f64 add.
    k = dyn.slices[0].shape[axis]
    acc = None
    acc32 = None
    lows = {}
    for L in sorted(by_level, reverse=True):
        if L >= 4:
            t32 = by_level[L].astype(jnp.float32) * np.float32(
                2.0 ** (-Q * (L + 2)))
            acc32 = t32 if acc32 is None else acc32 + t32
        else:
            lows[L] = by_level[L]
    terms = []
    for base in (2, 0):
        hi_l, lo_l = lows.pop(base, None), lows.pop(base + 1, None)
        if hi_l is None and lo_l is None:
            continue
        ok = (base + 2) * k * (2 ** (12 + Q)) < 2 ** 31
        if ok and hi_l is not None and lo_l is not None:
            pair = hi_l * (2 ** Q) + lo_l
            terms.append((pair, 2.0 ** (-Q * (base + 3))))
        else:
            if hi_l is not None:
                terms.append((hi_l, 2.0 ** (-Q * (base + 2))))
            if lo_l is not None:
                terms.append((lo_l, 2.0 ** (-Q * (base + 3))))
    for S_int, w in terms:
        term = S_int.astype(jnp.float64) * w
        acc = term if acc is None else acc + term
    if acc32 is not None:
        t = acc32.astype(jnp.float64)
        acc = t if acc is None else acc + t
    scale = dyn.scale
    ax = axis % scale.ndim
    if ax != scale.ndim - 1:
        scale = jnp.moveaxis(scale, ax, -1)
    return acc * scale * st.scale


def matmul(A, B_static: StaticSplit, n_slices: int = S_FULL,
           split_impl: str = None):
    """One-shot A (..., k) @ B (k, n) with a fresh dynamic split."""
    return mm(split_dyn(A, n_slices, impl=split_impl), B_static)


def tensordot(A, st: StaticSplit, axis: int, n_slices: int = S_FULL,
              split_impl: str = None):
    """f64-accurate jnp.tensordot(A, B, axes=[[axis], [0]]): the
    contracted axis is replaced by B's free axis, appended LAST."""
    return mm(split_dyn(A, n_slices, axis=axis, impl=split_impl),
              st, axis=axis)
