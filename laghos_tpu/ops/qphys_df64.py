"""Pointwise quadrature physics in double-float (two-f32) arithmetic.

The df64 image of ops/qphys.physics_3d (itself mirroring
laghos_solver.cpp:1042-1168): the same EOS / viscosity / eigen / dt
chain, with every f64 scalar replaced by a (hi, lo) f32 pair from
ops/df64.  Written over plain jnp f32 arrays so it runs INSIDE a Pallas
TPU kernel (ops/pallas_df64.py) where all ~300 intermediates stay in
VMEM — XLA's own f64 emulation of this chain round-trips HBM at fusion
boundaries and measured ~30 ms at the ns2 q-lattice vs a ~3 ms
roofline.

Accuracy: ~2^-48 relative per op — the same double-float class as
XLA's f64-on-TPU emulation, so the ozaki ("f64-accurate") mode keeps
its accuracy claim.  The eigen-solves keep the hybrid scheme of
ops/smallmat.eig3s_hybrid: native-f32 Jacobi sweeps (angle ~eps32),
then df64 Rayleigh/adjugate refinements that square the error.

Layout convention: every scalar field is a (hi, lo) tuple of
same-shaped f32 arrays; matrices are 9-tuples (row-major [a][b]) of
such pairs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import df64 as df
from .smallmat import _pick_smallest_f32, _sweeps_f32


def _rayleigh_df(A6, x, y, z):
    """Rayleigh quotient v'Av / v'v of a df64 3-vector against the df64
    symmetric matrix (a00, a11, a22, a01, a02, a12)."""
    a00, a11, a22, a01, a02, a12 = A6
    Ax = df.add(df.add(df.mul(a00, x), df.mul(a01, y)), df.mul(a02, z))
    Ay = df.add(df.add(df.mul(a01, x), df.mul(a11, y)), df.mul(a12, z))
    Az = df.add(df.add(df.mul(a02, x), df.mul(a12, y)), df.mul(a22, z))
    num = df.add(df.add(df.mul(x, Ax), df.mul(y, Ay)), df.mul(z, Az))
    den = df.norm2_3(x, y, z)
    bad = den[0] == 0.0
    den = df.where(bad, df.widen(jnp.ones_like(den[0])), den)
    return df.div(num, den)


def _rayleigh_df_f32vec(A6, x32, y32, z32):
    """Rayleigh quotient of an f32 vector (exact values) in df64."""
    a00, a11, a22, a01, a02, a12 = A6
    Ax = df.add(df.add(df.mul_f(a00, x32), df.mul_f(a01, y32)),
                df.mul_f(a02, z32))
    Ay = df.add(df.add(df.mul_f(a01, x32), df.mul_f(a11, y32)),
                df.mul_f(a12, z32))
    Az = df.add(df.add(df.mul_f(a02, x32), df.mul_f(a12, y32)),
                df.mul_f(a22, z32))
    num = df.add(df.add(df.mul_f(Ax, x32), df.mul_f(Ay, y32)),
                 df.mul_f(Az, z32))
    hx, ex = df.two_prod(x32, x32)
    hy, ey = df.two_prod(y32, y32)
    hz, ez = df.two_prod(z32, z32)
    den = df.add(df.add((hx, ex), (hy, ey)), (hz, ez))
    bad = den[0] == 0.0
    den = df.where(bad, df.widen(jnp.ones_like(den[0])), den)
    return df.div(num, den)


def eig3s_hybrid_df(A6, *, sweeps=4, want_vector=True):
    """df64 port of ops/smallmat.eig3s_hybrid.

    Returns (mu df64, (ux, uy, uz) df64 UNNORMALIZED eigendirection or
    None).  Downstream only uses the direction through the ratio
    |M u| / |u|, so the adjugate vector is left unnormalized (skipping
    a df64 rsqrt); the degenerate fallback keeps the f32 sweep vector
    (unit to f32), exactly the eig3s_hybrid convention.
    """
    a00, a11, a22, a01, a02, a12 = A6
    d0, d1, d2, V = _sweeps_f32(a00[0], a11[0], a22[0],
                                a01[0], a02[0], a12[0], sweeps)
    mu32, vx, vy, vz = _pick_smallest_f32(d0, d1, d2, V)
    mu = _rayleigh_df_f32vec(A6, vx, vy, vz)
    ok = jnp.isfinite(mu[0])
    mu = df.where(ok, mu, df.widen(mu32))
    if not want_vector:
        return mu, None

    # adjugate null-space step: u = adj(A - mu I) . v32 (df64)
    b00 = df.sub(a00, mu)
    b11 = df.sub(a11, mu)
    b22 = df.sub(a22, mu)
    c00 = df.sub(df.mul(b11, b22), df.sqr(a12))
    c01 = df.sub(df.mul(a02, a12), df.mul(a01, b22))
    c02 = df.sub(df.mul(a01, a12), df.mul(a02, b11))
    c11 = df.sub(df.mul(b00, b22), df.sqr(a02))
    c12 = df.sub(df.mul(a01, a02), df.mul(b00, a12))
    c22 = df.sub(df.mul(b00, b11), df.sqr(a01))
    ux = df.add(df.add(df.mul_f(c00, vx), df.mul_f(c01, vy)),
                df.mul_f(c02, vz))
    uy = df.add(df.add(df.mul_f(c01, vx), df.mul_f(c11, vy)),
                df.mul_f(c12, vz))
    uz = df.add(df.add(df.mul_f(c02, vx), df.mul_f(c12, vy)),
                df.mul_f(c22, vz))
    nu2 = df.norm2_3(ux, uy, uz)
    # magnitude scale from the hi words (threshold only)
    m = jnp.maximum(jnp.maximum(jnp.abs(a00[0]), jnp.abs(a11[0])),
                    jnp.maximum(jnp.abs(a22[0]), jnp.abs(a01[0])))
    m = jnp.maximum(m, jnp.maximum(jnp.abs(a02[0]), jnp.abs(a12[0])))
    tol = np.float32(1e-6)
    thr = (tol * m * m) ** 2
    good = (nu2[0] > thr) & jnp.isfinite(nu2[0])
    ex = df.where(good, ux, df.widen(vx))
    ey = df.where(good, uy, df.widen(vy))
    ez = df.where(good, uz, df.widen(vz))
    mu2 = _rayleigh_df(A6, ex, ey, ez)
    mu = df.where(good & jnp.isfinite(mu2[0]), mu2, mu)
    return mu, (ex, ey, ez)


def physics_3d_df(J, dV, J0i, e_q, rww, gm1, gg1, w, h0_e, *, h1order,
                  cfl, use_viscosity=True, use_vorticity=False,
                  hard_visc=False, eig_sweeps=4):
    """df64 image of qphys.physics_3d.

    J, dV, J0i: 9-tuples of df64 pairs; e_q, h0_e: df64 pairs.
    Precombined static fields (split once at setup):
      rww = rho0DetJ0w / w_q,  gm1 = gamma - 1,  gg1 = gamma*(gamma-1),
      w = quadrature weight (so winv never appears: R = rww*idet and
      the sJit weight is detJ * w).
    h1order, cfl: python floats.  Returns (sJit 9-tuple of df64, dtq
    df64, visc df64).  Semantics: qphys.physics_3d /
    laghos_solver.cpp:1042-1168.
    """
    f32 = np.float32
    (j00, j01, j02, j10, j11, j12, j20, j21, j22) = J
    # adjugate + det
    c00 = df.sub(df.mul(j11, j22), df.mul(j12, j21))
    c01 = df.sub(df.mul(j02, j21), df.mul(j01, j22))
    c02 = df.sub(df.mul(j01, j12), df.mul(j02, j11))
    c10 = df.sub(df.mul(j12, j20), df.mul(j10, j22))
    c11 = df.sub(df.mul(j00, j22), df.mul(j02, j20))
    c12 = df.sub(df.mul(j02, j10), df.mul(j00, j12))
    c20 = df.sub(df.mul(j10, j21), df.mul(j11, j20))
    c21 = df.sub(df.mul(j01, j20), df.mul(j00, j21))
    c22 = df.sub(df.mul(j00, j11), df.mul(j01, j10))
    detJ = df.add(df.add(df.mul(j00, c00), df.mul(j01, c10)),
                  df.mul(j02, c20))
    safe = detJ[0] != 0.0
    det_s = df.where(safe, detJ, df.widen(jnp.ones_like(detJ[0])))
    idet = df.recip(det_s)
    i00, i01, i02 = df.mul(c00, idet), df.mul(c01, idet), df.mul(c02, idet)
    i10, i11, i12 = df.mul(c10, idet), df.mul(c11, idet), df.mul(c12, idet)
    i20, i21, i22 = df.mul(c20, idet), df.mul(c21, idet), df.mul(c22, idet)

    R = df.mul(rww, idet)
    zero = jnp.zeros_like(e_q[0])
    Epos = e_q[0] > 0.0
    E = df.where(Epos, e_q, (zero, zero))
    P = df.mul(df.mul(gm1, R), E)
    S = df.sqrt(df.mul(gg1, E))

    # physical velocity gradient g = dV . Jinv
    (d00, d01, d02, d10, d11, d12, d20, d21, d22) = dV
    g00 = df.dot3(d00, d01, d02, i00, i10, i20)
    g01 = df.dot3(d00, d01, d02, i01, i11, i21)
    g02 = df.dot3(d00, d01, d02, i02, i12, i22)
    g10 = df.dot3(d10, d11, d12, i00, i10, i20)
    g11 = df.dot3(d10, d11, d12, i01, i11, i21)
    g12 = df.dot3(d10, d11, d12, i02, i12, i22)
    g20 = df.dot3(d20, d21, d22, i00, i10, i20)
    g21 = df.dot3(d20, d21, d22, i01, i11, i21)
    g22 = df.dot3(d20, d21, d22, i02, i12, i22)

    Jinv9 = (i00, i01, i02, i10, i11, i12, i20, i21, i22)
    if not use_viscosity:
        negP = df.neg(P)
        z2 = (zero, zero)
        return _finish_df(J, (negP, negP, negP, z2, z2, z2), z2, Jinv9,
                          detJ, S, w, h1order=h1order, cfl=cfl,
                          eig_sweeps=eig_sweeps)

    vort = None
    if use_vorticity:
        fro2 = df.add(df.add(df.norm2_3(g00, g01, g02),
                             df.norm2_3(g10, g11, g12)),
                      df.norm2_3(g20, g21, g22))
        fro = df.sqrt(fro2)
        div_v = df.abs_(df.add(df.add(g00, g11), g22))
        ratio = df.div(df.where(fro[0] > 0.0, div_v, (zero, zero)),
                       df.where(fro[0] > 0.0, fro,
                                df.widen(jnp.ones_like(zero))))
        one_p = df.widen(jnp.ones_like(zero))
        vort = df.where(fro[0] > 0.0, ratio, one_p)

    s00, s11, s22 = g00, g11, g22
    half = f32(0.5)
    s01 = df.mul_pow2(df.add(g01, g10), half)
    s02 = df.mul_pow2(df.add(g02, g20), half)
    s12 = df.mul_pow2(df.add(g12, g21), half)

    mu, (ex, ey, ez) = eig3s_hybrid_df(
        (s00, s11, s22, s01, s02, s12), sweeps=eig_sweeps)

    # Jpi = J . Jac0inv; ph = Jpi . e  (e unnormalized; h uses the ratio)
    (o00, o01, o02, o10, o11, o12, o20, o21, o22) = J0i
    p00 = df.dot3(j00, j01, j02, o00, o10, o20)
    p01 = df.dot3(j00, j01, j02, o01, o11, o21)
    p02 = df.dot3(j00, j01, j02, o02, o12, o22)
    p10 = df.dot3(j10, j11, j12, o00, o10, o20)
    p11 = df.dot3(j10, j11, j12, o01, o11, o21)
    p12 = df.dot3(j10, j11, j12, o02, o12, o22)
    p20 = df.dot3(j20, j21, j22, o00, o10, o20)
    p21 = df.dot3(j20, j21, j22, o01, o11, o21)
    p22 = df.dot3(j20, j21, j22, o02, o12, o22)
    phx = df.dot3(p00, p01, p02, ex, ey, ez)
    phy = df.dot3(p10, p11, p12, ex, ey, ez)
    phz = df.dot3(p20, p21, p22, ex, ey, ez)
    num2 = df.norm2_3(phx, phy, phz)
    den2 = df.norm2_3(ex, ey, ez)
    den_ok = den2[0] > 0.0
    den2 = df.where(den_ok, den2, df.widen(jnp.ones_like(zero)))
    h = df.mul(h0_e, df.sqrt(df.div(num2, den2)))

    Rh = df.mul(R, h)
    visc = df.mul_pow2(df.mul(df.mul(Rh, h), df.abs_(mu)), f32(2.0))
    if hard_visc:
        # legacy AMR kernels: hard mu < 0 switch (amr/solver.py)
        add_t = df.mul_pow2(df.mul(Rh, S), f32(0.5))
        visc = df.where(mu[0] < 0.0, df.add(visc, add_t), visc)
    else:
        # smoothstep((mu - 2e) / 2e) with eps = 1e-12: the transition
        # band is 1e-12 wide around 0, so y needs df64 resolution of mu
        eps_hi, eps_lo = df.const(1e-12)
        eps_d = (eps_hi * jnp.ones_like(zero), eps_lo * jnp.ones_like(zero))
        y = df.div(df.sub(mu, eps_d), df.mul_pow2(eps_d, f32(2.0)))
        one_d = df.widen(jnp.ones_like(zero))
        y = df.where(y[0] < 0.0, (zero, zero), y)
        y = df.where(df.gt(y, one_d), one_d, y)
        step = df.mul(df.sub(df.widen(jnp.full_like(zero, 3.0)),
                             df.mul_pow2(y, f32(2.0))), df.sqr(y))
        sm = df.mul_pow2(df.mul(Rh, S), f32(0.5))
        if vort is not None:
            sm = df.mul(sm, vort)
        visc = df.add(visc, df.mul(sm, df.sub(one_d, step)))

    negP = df.neg(P)
    st00 = df.add(negP, df.mul(visc, s00))
    st11 = df.add(negP, df.mul(visc, s11))
    st22 = df.add(negP, df.mul(visc, s22))
    st01 = df.mul(visc, s01)
    st02 = df.mul(visc, s02)
    st12 = df.mul(visc, s12)
    visc_over_R = df.div(visc, R)
    return _finish_df(J, (st00, st11, st22, st01, st02, st12), visc,
                      Jinv9, detJ, S, w, h1order=h1order, cfl=cfl,
                      eig_sweeps=eig_sweeps, visc_over_R=visc_over_R)


def _finish_df(J, st, visc, Jinv9, detJ, S, w, *, h1order, cfl,
               eig_sweeps, visc_over_R=None):
    """Shared tail: min-singular-value dt estimate + stress.J^-T
    assembly (qphys._finish in df64)."""
    f32 = np.float32
    (j00, j01, j02, j10, j11, j12, j20, j21, j22) = J
    st00, st11, st22, st01, st02, st12 = st
    zero = jnp.zeros_like(detJ[0])

    # J^T J (df64), smallest eigenvalue via the hybrid (values only)
    t00 = df.norm2_3(j00, j10, j20)
    t11 = df.norm2_3(j01, j11, j21)
    t22 = df.norm2_3(j02, j12, j22)
    t01 = df.dot3(j00, j10, j20, j01, j11, j21)
    t02 = df.dot3(j00, j10, j20, j02, j12, j22)
    t12 = df.dot3(j01, j11, j21, j02, j12, j22)
    lam, _ = eig3s_hybrid_df((t00, t11, t22, t01, t02, t12),
                             sweeps=eig_sweeps, want_vector=False)
    lam = df.where(lam[0] > 0.0, lam, (zero, zero))
    sv = df.sqrt(lam)

    # 1/h1order is NOT exactly representable (e.g. 1/3): a single-f32
    # constant would inject a systematic ~6e-8 bias into every dtq —
    # split it to a df64 pair instead (host-side, exact to f64)
    ih1_hi, ih1_lo = df.const(1.0 / float(h1order))
    h_min = df.add(df.mul_f(sv, ih1_hi), df.mul_f(sv, ih1_lo))
    # idt = S/h_min + 2.5 * vR / h_min^2
    hm_ok = h_min[0] > 0.0
    hm_s = df.where(hm_ok, h_min, df.widen(jnp.ones_like(zero)))
    ih = df.recip(hm_s)
    idt = df.mul(S, ih)
    if visc_over_R is not None:
        idt = df.add(idt, df.mul(df.mul_f(visc_over_R, f32(2.5)),
                                 df.sqr(ih)))
    pos = idt[0] > 0.0
    idt_s = df.where(pos, idt, df.widen(jnp.ones_like(zero)))
    cfl_d = df.const(cfl)
    cfl_p = (cfl_d[0] * jnp.ones_like(zero), cfl_d[1] * jnp.ones_like(zero))
    dtq = df.div(cfl_p, idt_s)
    inf_p = (jnp.full_like(zero, jnp.inf), zero)
    dtq = df.where(pos, dtq, inf_p)
    # inverted/non-finite elements reject the step (qphys._finish)
    good = (jnp.isfinite(detJ[0]) & (detJ[0] >= 0.0)
            & ~jnp.isnan(idt[0]) & hm_ok)
    # hm_ok joins the guard: sv == 0 means a degenerate J, which the
    # f64 path reaches as idt = inf -> dtq = 0 via the idt > 0 branch
    dtq = df.where(good, dtq, (zero, zero))

    # sJit[gd*3+vd] = (sum_k stress[vd][k] Jinv[gd][k]) * detJ * w
    wd = df.mul(detJ, w)
    stress = ((st00, st01, st02), (st01, st11, st12), (st02, st12, st22))
    Jinv = ((Jinv9[0], Jinv9[1], Jinv9[2]),
            (Jinv9[3], Jinv9[4], Jinv9[5]),
            (Jinv9[6], Jinv9[7], Jinv9[8]))
    sJit = []
    for gd in range(3):
        for vd in range(3):
            acc = df.dot3(stress[vd][0], stress[vd][1], stress[vd][2],
                          Jinv[gd][0], Jinv[gd][1], Jinv[gd][2])
            sJit.append(df.mul(acc, wd))
    return tuple(sJit), dtq, visc
