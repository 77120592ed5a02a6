"""Double-float (two-f32) arithmetic for Pallas TPU kernels.

TPU has no f64 ALU; XLA emulates f64 on the VPU as an unevaluated sum
of two floats (double-float), but each emulated op round-trips HBM at
XLA's fusion boundaries — the pointwise qupdate physics chain measured
~30 ms at the ns2 q-lattice (2.1M points) against a ~3 ms roofline.
Pallas kernels keep every intermediate in VMEM, but Mosaic does not
lower f64 either, so a VMEM-resident f64-class physics kernel needs the
double-float arithmetic spelled out over NATIVE f32 pairs.  This module
is that arithmetic: classic error-free transformations (Dekker 1971,
Knuth TAOCP v2 §4.2.2, Bailey's dsfun90/QD algorithms), representing a
value as hi + lo with |lo| <= ulp(hi)/2 — ~2^-48 relative accuracy,
the same class as XLA's own f64-on-TPU emulation.

Everything is plain jnp over f32 arrays, so the same code runs inside a
Pallas kernel, under `interpret=True` on CPU for tests, or as ordinary
XLA ops.  Correctness requires round-to-nearest f32 without fast-math
reassociation, which XLA and Mosaic honor.

A df64 value is a plain `(hi, lo)` tuple of same-shaped f32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

F32 = np.float32
# Veltkamp split constant for f32 (p=24): 2^ceil(p/2) + 1
_SPLIT = F32(4097.0)
_HALF = F32(0.5)
_ONE = F32(1.0)
_ZERO = F32(0.0)


# ---------------------------------------------------------------- EFTs --
def two_sum(a, b):
    """Error-free a + b = s + err (Knuth; no magnitude ordering)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Error-free a + b = s + err assuming |a| >= |b| (Dekker)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _veltkamp(a):
    """a = hi + lo with hi holding the top 12 bits (exact)."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + err (Dekker via Veltkamp split; no FMA
    dependence — Mosaic exposes no contraction guarantee)."""
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ------------------------------------------------------------ df64 ops --
def const(x):
    """Python scalar -> df64 constant pair (host-side split)."""
    hi = np.float32(x)
    lo = np.float32(float(x) - float(hi))
    return F32(hi), F32(lo)


def from_f64(x):
    """f64 array -> (hi, lo) f32 pair (exact two-term decomposition)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(a, dtype=jnp.float64):
    hi, lo = a
    return hi.astype(dtype) + lo.astype(dtype)


def widen(hi):
    """f32 array -> df64 with zero low word."""
    return hi, jnp.zeros_like(hi)


def add(a, b):
    """Robust df64 + df64 (QD accurate variant: correct for any signs)."""
    s, e = two_sum(a[0], b[0])
    t, f = two_sum(a[1], b[1])
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    return quick_two_sum(s, e)


def add_f(a, b):
    """df64 + f32."""
    s, e = two_sum(a[0], b)
    e = e + a[1]
    return quick_two_sum(s, e)


def neg(a):
    return -a[0], -a[1]


def sub(a, b):
    return add(a, neg(b))


def sub_f(a, b):
    return add_f(a, -b)


def mul(a, b):
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def mul_f(a, b):
    """df64 * f32."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def mul_pow2(a, s):
    """df64 * exact power of two (error-free)."""
    return a[0] * s, a[1] * s


def sqr(a):
    p, e = two_prod(a[0], a[0])
    e = e + F32(2.0) * (a[0] * a[1])
    return quick_two_sum(p, e)


def div(a, b):
    """df64 / df64 (dsfun90 long-division: 3 f32 quotient digits)."""
    q1 = a[0] / b[0]
    r = sub(a, mul_f(b, q1))
    q2 = r[0] / b[0]
    r = sub(r, mul_f(b, q2))
    q3 = r[0] / b[0]
    s, e = quick_two_sum(q1, q2)
    return add_f((s, e), q3)


def recip(b):
    return div(widen(_ONE * jnp.ones_like(b[0])), b)


def sqrt(a):
    """df64 sqrt via f32 rsqrt seed + one error-compensated Newton step
    (Karp & Markstein); exact 0 stays 0, negatives produce NaN like
    jnp.sqrt."""
    zero = a[0] == 0.0
    ahi = jnp.where(zero, _ONE, a[0])
    x0 = F32(1.0) / jnp.sqrt(ahi)         # ~24-bit rsqrt
    s = ahi * x0                                       # ~24-bit sqrt
    # e = a - s^2 (df64-exact); correction e * x0 / 2 squares the error
    p, pe = two_prod(s, s)
    e = add(a, (-p, -pe))
    corr = e[0] * (_HALF * x0)
    hi, lo = quick_two_sum(s, corr)
    hi = jnp.where(zero, _ZERO, hi)
    lo = jnp.where(zero, _ZERO, lo)
    return hi, lo


def abs_(a):
    m = a[0] < 0.0
    return jnp.where(m, -a[0], a[0]), jnp.where(m, -a[1], a[1])


# ----------------------------------------------------- compare / select --
def lt(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def le(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def gt(a, b):
    return lt(b, a)


def ge(a, b):
    return le(b, a)


def lt_f(a, b):
    return (a[0] < b) | ((a[0] == b) & (a[1] < 0.0))


def gt_f(a, b):
    return (a[0] > b) | ((a[0] == b) & (a[1] > 0.0))


def where(m, a, b):
    return jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1])


def max_(a, b):
    return where(ge(a, b), a, b)


def min_(a, b):
    return where(le(a, b), a, b)


def zeros_like(a):
    z = jnp.zeros_like(a[0] if isinstance(a, tuple) else a)
    return z, z


# ------------------------------------------------------------- helpers --
def dot3(ax, ay, az, bx, by, bz):
    """sum_i a_i * b_i for df64 3-vectors."""
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def norm2_3(x, y, z):
    """x^2 + y^2 + z^2."""
    return add(add(sqr(x), sqr(y)), sqr(z))
