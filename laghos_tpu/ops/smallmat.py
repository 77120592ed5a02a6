"""Vectorized small dense-matrix kernels (det, inverse, sym-eig, min SV).

TPU-native equivalents of the mfem::kernels device helpers used by the
reference's quadrature-point physics (SURVEY M10, laghos_solver.cpp:
1078-1158).  All functions operate on trailing (d, d) axes with arbitrary
batch dims, in closed form (no iterative LAPACK), so they fuse into the
surrounding jitted kernel.

Matrix index convention: A[..., a, b] with a the row.  For Jacobians,
J[..., a, b] = dx_a/dxhat_b.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det(J: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 1:
        return J[..., 0, 0]
    if d == 2:
        return (J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0])
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    p, q, r = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    u, v, w = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    return a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)


def inv(J: jnp.ndarray, d: int, detJ=None) -> jnp.ndarray:
    if detJ is None:
        detJ = det(J, d)
    idet = 1.0 / detJ
    if d == 1:
        return idet[..., None, None]
    if d == 2:
        r0 = jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1)
        r1 = jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1)
        return jnp.stack([r0, r1], axis=-2) * idet[..., None, None]
    # 3x3 adjugate
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    p, q, r = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    u, v, w = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    A = jnp.stack(
        [
            jnp.stack([q * w - r * v, c * v - b * w, b * r - c * q], -1),
            jnp.stack([r * u - p * w, a * w - c * u, c * p - a * r], -1),
            jnp.stack([p * v - q * u, b * u - a * v, a * q - b * p], -1),
        ],
        axis=-2,
    )
    return A * idet[..., None, None]


def _eig2_smallest(A: jnp.ndarray):
    """Smallest eigenvalue + its eigenvector of symmetric 2x2.

    Faithful to mfem::kernels::CalcEigenvalues<2> /
    internal::Eigensystem2S (Parlett's rotation), including the
    d12 == 0 tie-break with vec = (1, 0) when A[0,0] <= A[1,1].
    """
    lam_min, vx, vy = eig2_smallest_scalar(
        A[..., 0, 0], A[..., 1, 1], A[..., 0, 1])
    return lam_min, jnp.stack([vx, vy], axis=-1)


def eig2_smallest_scalar(d1, d2, d12):
    """Scalar-component form of _eig2_smallest (shared by the
    whole-lattice 2D physics, ops/qphys.physics_2d): returns
    (lam_min, vx, vy)."""
    sqrt_1_eps = jnp.sqrt(1.0 / jnp.finfo(jnp.float64).eps)
    zeta = (d2 - d1) / (2.0 * jnp.where(d12 == 0.0, 1.0, d12))
    azeta = jnp.abs(zeta)
    t_small = jnp.sign(zeta) / (azeta + jnp.sqrt(1.0 + zeta * zeta))
    t_small = jnp.where(zeta == 0.0, 1.0, t_small)  # copysign(.,0)=+
    t_big = jnp.sign(zeta) * (0.5 / azeta)
    t = jnp.where(azeta < sqrt_1_eps, t_small, t_big)
    c = jnp.sqrt(1.0 / (1.0 + t * t))
    s = c * t
    shift = t * d12
    e1 = d1 - shift
    e2 = d2 + shift
    # d12 == 0 -> identity rotation
    c = jnp.where(d12 == 0.0, 1.0, c)
    s = jnp.where(d12 == 0.0, 0.0, s)
    e1 = jnp.where(d12 == 0.0, d1, e1)
    e2 = jnp.where(d12 == 0.0, d2, e2)
    first = e1 <= e2
    lam_min = jnp.where(first, e1, e2)
    vx = jnp.where(first, c, s)
    vy = jnp.where(first, -s, c)
    return lam_min, vx, vy


def min_sv2_scalar(a, b, c, dd):
    """Scalar-component 2x2 smallest singular value (same stable
    closed form as min_singular_value's d == 2 branch)."""
    E = (a + dd) / 2.0
    F = (a - dd) / 2.0
    G = (c + b) / 2.0
    H = (c - b) / 2.0
    Q = jnp.hypot(E, H)
    R = jnp.hypot(F, G)
    return jnp.abs(Q - R)


def _jacobi_rotation(app, aqq, apq, inv=None):
    """Stable (c, s, t) annihilating the (p,q) entry (Golub & Van Loan).

    All constants are built dtype-matched (Mosaic/Pallas rejects stray
    64-bit scalars that python literals produce under x64 mode).
    Also returns t = tan(theta) so callers can use the cheap exact
    diagonal update app' = app - t*apq, aqq' = aqq + t*apq (GvL 8.4).
    `inv` is accepted for signature stability and ignored (an f32-angle
    variant was measured slower on TPU: emulated f64 is op-count-bound,
    and the extra conversions/residual updates outweigh the saved
    div/sqrt).
    """
    one = jnp.ones_like(apq)
    zero = jnp.zeros_like(apq)
    nonzero = apq != 0.0
    safe = jnp.where(nonzero, apq, one)
    tau = (aqq - app) / (2.0 * safe)
    # tau can be non-finite on TPU even for nonzero apq: the f64
    # emulation has f32 exponent range and flushes denormals, so a
    # denormal apq with equal diagonals gives 0/0 = NaN (and a huge
    # ratio overflows to inf).  Either way the off-diagonal entry is
    # negligible — skip the rotation.
    ok = nonzero & jnp.isfinite(tau)
    sgn = jnp.where(tau >= 0.0, one, -one)
    tau_s = jnp.where(ok, tau, zero)
    t = sgn / (jnp.abs(tau_s) + jnp.sqrt(one + tau_s * tau_s))
    c = one / jnp.sqrt(one + t * t)
    s = t * c
    c = jnp.where(ok, c, one)
    s = jnp.where(ok, s, zero)
    t = jnp.where(ok, t, zero)
    return c, s, t


def jacobi_rot_step(app, aqq, apq, arp, arq):
    """One guarded Jacobi rotation in the (p,q) plane; r = third index.

    Returns (app', aqq', apq', arp', arq', c, s) with apq' = 0 for an
    applied rotation.  Rotations whose updates come out NaN are SKIPPED
    (identity, apq kept): XLA's TPU f64 emulation (double-float, f32
    exponent range, flushed denormals) can NaN on cancellation patterns
    that are exact in IEEE f64; skipping only delays convergence of
    that point, and on IEEE hosts the guard never fires."""
    c, s, t = _jacobi_rotation(app, aqq, apq)
    app_n = app - t * apq
    aqq_n = aqq + t * apq
    arp_n = c * arp - s * arq
    arq_n = s * arp + c * arq
    bad = (jnp.isnan(app_n) | jnp.isnan(aqq_n) | jnp.isnan(arp_n)
           | jnp.isnan(arq_n))
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(s)
    return (jnp.where(bad, app, app_n), jnp.where(bad, aqq, aqq_n),
            jnp.where(bad, apq, zero),
            jnp.where(bad, arp, arp_n), jnp.where(bad, arq, arq_n),
            jnp.where(bad, one, c), jnp.where(bad, zero, s))


def _eig3_smallest(A: jnp.ndarray, sweeps: int = 4):
    """Smallest eigenvalue + eigenvector of symmetric 3x3 batches.

    Fixed-count cyclic Jacobi iteration, fully scalarized (the 6 unique
    entries of the symmetric matrix and the 9 accumulated-rotation entries
    are independent arrays, so the whole solve is branch-free elementwise
    VPU arithmetic — no scatters, no batched 3x3 matmuls).  Machine-
    precision eigenvalues including nearly-degenerate spectra where
    closed-form trigonometric methods lose ~sqrt(eps).  For exactly
    repeated smallest eigenvalues the rotations leave the coordinate
    direction of the corresponding diagonal entry, matching the
    reference's diagonal-case eigenvector convention (mfem kernels
    CalcEigenvalues<3>, used at laghos_solver.cpp:1113).
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    V = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    rot = jacobi_rot_step

    def vupd(c, s, p, q):
        for i in range(3):
            vip, viq = V[i][p], V[i][q]
            V[i][p] = c * vip - s * viq
            V[i][q] = s * vip + c * viq

    for _ in range(sweeps):
        # (p,q) = (0,1), r = 2
        a00, a11, a01, a02, a12, c, s = rot(a00, a11, a01, a02, a12)
        vupd(c, s, 0, 1)
        # (p,q) = (0,2), r = 1
        a00, a22, a02, a01, a12, c, s = rot(a00, a22, a02, a01, a12)
        vupd(c, s, 0, 2)
        # (p,q) = (1,2), r = 0
        a11, a22, a12, a01, a02, c, s = rot(a11, a22, a12, a01, a02)
        vupd(c, s, 1, 2)

    dia = jnp.stack([a00, a11, a22], axis=-1)
    k = jnp.argmin(dia, axis=-1)
    lam_min = jnp.min(dia, axis=-1)
    cols = jnp.stack(
        [jnp.stack([V[0][j], V[1][j], V[2][j]], axis=-1) for j in range(3)],
        axis=-2)  # (..., col j, i)
    vec = jnp.take_along_axis(
        cols, k[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return lam_min, vec


def sym_eig_smallest(A: jnp.ndarray, d: int):
    """(lambda_min, eigenvector) of a symmetric dxd matrix batch."""
    if d == 1:
        return A[..., 0, 0], jnp.ones_like(A[..., 0, :])
    if d == 2:
        return _eig2_smallest(A)
    return _eig3_smallest(A)


def min_singular_value(J: jnp.ndarray, d: int) -> jnp.ndarray:
    """Smallest singular value of J (mfem kernels::CalcSingularvalue)."""
    if d == 1:
        return jnp.abs(J[..., 0, 0])
    if d == 2:
        # Stable closed-form 2x2 SVD (no cancellation for near-isotropic J,
        # which is the state of every undisturbed element): with
        # E,F = (a±d)/2 and G,H = (c±b)/2, the singular values are
        # |Q±R| for Q = |(E,H)|, R = |(F,G)|.
        return min_sv2_scalar(J[..., 0, 0], J[..., 0, 1],
                              J[..., 1, 0], J[..., 1, 1])
    JtJ = jnp.einsum("...ka,...kb->...ab", J, J)
    lam_min = _eig3_values_min(JtJ)
    return jnp.sqrt(jnp.maximum(lam_min, 0.0))


def _sweeps_f32(a00, a11, a22, a01, a02, a12, sweeps):
    """Cyclic Jacobi in NATIVE f32 with accumulated rotations.

    On TPU every df64 rotation costs ~10-30x its f32 form (the
    emulated div/sqrt dominate the whole qupdate phase — measured
    ~26 ms of a 63 ms rs4 qupdate); f32 hardware sweeps get the
    eigenbasis to ~1e-7, which the df64 refinements below square away.
    Returns (d0, d1, d2, V[3][3]) in f32."""
    f32 = jnp.float32
    a00, a11, a22, a01, a02, a12 = (x.astype(f32) for x in
                                    (a00, a11, a22, a01, a02, a12))
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    V = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    def vupd(c, s, p, q):
        for i in range(3):
            vip, viq = V[i][p], V[i][q]
            V[i][p] = c * vip - s * viq
            V[i][q] = s * vip + c * viq

    for _ in range(sweeps):
        a00, a11, a01, a02, a12, c, s = jacobi_rot_step(
            a00, a11, a01, a02, a12)
        vupd(c, s, 0, 1)
        a00, a22, a02, a01, a12, c, s = jacobi_rot_step(
            a00, a22, a02, a01, a12)
        vupd(c, s, 0, 2)
        a11, a22, a12, a01, a02, c, s = jacobi_rot_step(
            a11, a22, a12, a01, a02)
        vupd(c, s, 1, 2)
    return a00, a11, a22, V


def _pick_smallest_f32(d0, d1, d2, V):
    m01 = d0 <= d1
    mu01 = jnp.where(m01, d0, d1)
    mu32 = jnp.minimum(mu01, d2)
    p0 = m01 & (d0 <= d2)
    p1 = (~m01) & (d1 <= d2)
    vx = jnp.where(p0, V[0][0], jnp.where(p1, V[0][1], V[0][2]))
    vy = jnp.where(p0, V[1][0], jnp.where(p1, V[1][1], V[1][2]))
    vz = jnp.where(p0, V[2][0], jnp.where(p1, V[2][1], V[2][2]))
    return mu32, vx, vy, vz


def eig3s_hybrid(a00, a11, a22, a01, a02, a12, *, sweeps=4,
                 want_vector=True):
    """Smallest eigenpair of scalarized symmetric 3x3 batches at
    f64-class accuracy for ~1/4 the emulated-f64 cost.

    Jacobi sweeps run in native f32 (angle error ~eps32); the f64
    refinements then square the error:
      * value: Rayleigh quotient of the f32 vector in f64 — error
        theta^2 * gap ~ 1e-14;
      * vector: u = adj(A - mu I) . v32 in f64 — for (near-)singular
        B = A - mu I the adjugate's range IS the null space, so this is
        one inverse-iteration step without the near-singular division;
        degenerate spectra (adj ~ 0) keep the f32 vector, whose
        direction within an eigen-cluster is physically immaterial
        (matches the reference's convention freedom at repeated
        eigenvalues, mfem kernels CalcEigenvalues<3>);
      * a second Rayleigh quotient on the refined vector tightens
        near-degenerate clusters.
    For f32 inputs the refinements run in f32 — one code path for both
    precisions."""
    dt = a00.dtype
    d0, d1, d2, V = _sweeps_f32(a00, a11, a22, a01, a02, a12, sweeps)
    mu32, vx32, vy32, vz32 = _pick_smallest_f32(d0, d1, d2, V)
    vx, vy, vz = (v.astype(dt) for v in (vx32, vy32, vz32))

    def rayleigh(x, y, z):
        Ax = a00 * x + a01 * y + a02 * z
        Ay = a01 * x + a11 * y + a12 * z
        Az = a02 * x + a12 * y + a22 * z
        num = x * Ax + y * Ay + z * Az
        den = x * x + y * y + z * z
        # dtype-matched constants (python literals materialize f64
        # scalars under x64, which the f32 Pallas path must not see)
        return num / jnp.where(den == 0.0, jnp.ones_like(den), den)

    mu = rayleigh(vx, vy, vz)
    ok = jnp.isfinite(mu)
    mu = jnp.where(ok, mu, mu32.astype(dt))
    if not want_vector:
        return mu, None

    # adjugate null-space step (df64): u = adj(A - mu I) . v
    b00 = a00 - mu
    b11 = a11 - mu
    b22 = a22 - mu
    c00 = b11 * b22 - a12 * a12
    c01 = a02 * a12 - a01 * b22
    c02 = a01 * a12 - a02 * b11
    c11 = b00 * b22 - a02 * a02
    c12 = a01 * a02 - b00 * a12
    c22 = b00 * b11 - a01 * a01
    ux = c00 * vx + c01 * vy + c02 * vz
    uy = c01 * vx + c11 * vy + c12 * vz
    uz = c02 * vx + c12 * vy + c22 * vz
    nu2 = ux * ux + uy * uy + uz * uz
    m = jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
                    jnp.maximum(jnp.abs(a22), jnp.abs(a01)))
    m = jnp.maximum(m, jnp.maximum(jnp.abs(a02), jnp.abs(a12)))
    # adj entries scale as m^2 * (relative eigen-gaps); below ~1e-6 the
    # cluster direction is arbitrary — keep the f32 vector
    tol = jnp.asarray(1e-6, dt)
    good = (nu2 > (tol * m * m) ** 2) & jnp.isfinite(nu2)
    one = jnp.ones_like(nu2)
    inu = one / jnp.sqrt(jnp.where(good, nu2, one))
    ex = jnp.where(good, ux * inu, vx)
    ey = jnp.where(good, uy * inu, vy)
    ez = jnp.where(good, uz * inu, vz)
    mu2 = rayleigh(ex, ey, ez)
    mu = jnp.where(good & jnp.isfinite(mu2), mu2, mu)
    return mu, (ex, ey, ez)


def _eig3_values_min(A: jnp.ndarray, sweeps: int = 4):
    """Smallest eigenvalue only (no eigenvector accumulation)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    zero = jnp.zeros_like(a00)

    for _ in range(sweeps):
        a00, a11, a01, a02, a12 = jacobi_rot_step(a00, a11, a01,
                                                  a02, a12)[:5]
        a00, a22, a02, a01, a12 = jacobi_rot_step(a00, a22, a02,
                                                  a01, a12)[:5]
        a11, a22, a12, a01, a02 = jacobi_rot_step(a11, a22, a12,
                                                  a01, a02)[:5]
    return jnp.minimum(jnp.minimum(a00, a11), a22)
