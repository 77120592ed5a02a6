"""Pointwise quadrature physics as a pure scalar-field function.

The qupdate pipeline splits into (a) sum-factorized interpolation (batched
matmuls — MXU) and (b) a purely pointwise physics chain (EOS, viscosity,
eigen-solve, dt — VPU).  This module is (b), written over flat per-point
scalar arrays so the SAME code runs as inline XLA ops or inside a fused
Pallas kernel (ops/pallas_qphys.py): every operation is elementwise.

3D specialization (the flagship path); 1D/2D use ops/qupdate.py directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .smallmat import eig3s_hybrid


def physics_3d(J, dV, J0i, e_q, rw, gamma, winv, *, h0_e, h1order, cfl,
               use_viscosity=True, use_vorticity=False, hard_visc=False,
               eig_sweeps=4):
    """All inputs are tuples/arrays of flat per-point scalars.

    J, dV, J0i: tuples of 9 arrays (row-major [a][b]); e_q, rw (rho0DetJ0w),
    winv (1/quad weight), h0_e (per-point h0, already depth-scaled) flat
    arrays; returns (sJit 9-tuple, dtq, visc).
    Mirrors laghos_solver.cpp:1042-1168 exactly.
    """
    (j00, j01, j02, j10, j11, j12, j20, j21, j22) = J
    # det + inverse (adjugate)
    c00 = j11 * j22 - j12 * j21
    c01 = j02 * j21 - j01 * j22
    c02 = j01 * j12 - j02 * j11
    c10 = j12 * j20 - j10 * j22
    c11 = j00 * j22 - j02 * j20
    c12 = j02 * j10 - j00 * j12
    c20 = j10 * j21 - j11 * j20
    c21 = j01 * j20 - j00 * j21
    c22 = j00 * j11 - j01 * j10
    detJ = j00 * c00 + j01 * c10 + j02 * c20
    idet = 1.0 / detJ
    i00, i01, i02 = c00 * idet, c01 * idet, c02 * idet
    i10, i11, i12 = c10 * idet, c11 * idet, c12 * idet
    i20, i21, i22 = c20 * idet, c21 * idet, c22 * idet

    R = rw * winv * idet
    E = jnp.maximum(0.0, e_q)
    P = (gamma - 1.0) * R * E
    S = jnp.sqrt(gamma * (gamma - 1.0) * E)

    # sgrad = dV . Jinv (physical velocity gradient)
    (d00, d01, d02, d10, d11, d12, d20, d21, d22) = dV
    g00 = d00 * i00 + d01 * i10 + d02 * i20
    g01 = d00 * i01 + d01 * i11 + d02 * i21
    g02 = d00 * i02 + d01 * i12 + d02 * i22
    g10 = d10 * i00 + d11 * i10 + d12 * i20
    g11 = d10 * i01 + d11 * i11 + d12 * i21
    g12 = d10 * i02 + d11 * i12 + d12 * i22
    g20 = d20 * i00 + d21 * i10 + d22 * i20
    g21 = d20 * i01 + d21 * i11 + d22 * i21
    g22 = d20 * i02 + d21 * i12 + d22 * i22

    vorticity_coeff = 1.0
    if use_vorticity:
        fro = jnp.sqrt(g00**2 + g01**2 + g02**2 + g10**2 + g11**2
                       + g12**2 + g20**2 + g21**2 + g22**2)
        div = jnp.abs(g00 + g11 + g22)
        vorticity_coeff = jnp.where(fro > 0.0,
                                    div / jnp.maximum(fro, 1e-300), 1.0)

    s00, s11, s22 = g00, g11, g22
    s01 = 0.5 * (g01 + g10)
    s02 = 0.5 * (g02 + g20)
    s12 = 0.5 * (g12 + g21)

    Jinv9 = (i00, i01, i02, i10, i11, i12, i20, i21, i22)
    if not use_viscosity:
        # pressure-only stress (inviscid problems): no eigen-solve
        zero = jnp.zeros_like(P)
        return _finish(J, (-P, -P, -P, zero, zero, zero), zero, Jinv9,
                       detJ, S, winv, h1order=h1order, cfl=cfl,
                       eig_sweeps=eig_sweeps)

    # smallest eigenpair of the strain rate: native-f32 Jacobi sweeps +
    # f64 Rayleigh/adjugate refinement (ops/smallmat.eig3s_hybrid) —
    # same accuracy class as all-f64 sweeps at ~1/4 the emulated-f64
    # cost (the sweeps were the largest single slice of qupdate time)
    mu, (ex, ey, ez) = eig3s_hybrid(s00, s11, s22, s01, s02, s12,
                                    sweeps=eig_sweeps)

    # Jpi = J . Jac0inv; ph = Jpi . e
    (o00, o01, o02, o10, o11, o12, o20, o21, o22) = J0i
    p00 = j00 * o00 + j01 * o10 + j02 * o20
    p01 = j00 * o01 + j01 * o11 + j02 * o21
    p02 = j00 * o02 + j01 * o12 + j02 * o22
    p10 = j10 * o00 + j11 * o10 + j12 * o20
    p11 = j10 * o01 + j11 * o11 + j12 * o21
    p12 = j10 * o02 + j11 * o12 + j12 * o22
    p20 = j20 * o00 + j21 * o10 + j22 * o20
    p21 = j20 * o01 + j21 * o11 + j22 * o21
    p22 = j20 * o02 + j21 * o12 + j22 * o22
    phx = p00 * ex + p01 * ey + p02 * ez
    phy = p10 * ex + p11 * ey + p12 * ez
    phz = p20 * ex + p21 * ey + p22 * ez
    h = (h0_e * jnp.sqrt(phx**2 + phy**2 + phz**2)
         / jnp.sqrt(ex**2 + ey**2 + ez**2))

    visc = 2.0 * R * h * h * jnp.abs(mu)
    if hard_visc:
        visc = visc + jnp.where(mu < 0.0, 0.5 * R * h * S, 0.0)
    else:
        eps = 1e-12
        y = (mu - 2.0 * eps + eps) / (2.0 * eps)
        y = jnp.clip(y, jnp.zeros_like(y), jnp.ones_like(y))
        step = (3.0 - 2.0 * y) * y * y
        visc = visc + (0.5 * R * h * S * vorticity_coeff * (1.0 - step))

    st00 = -P + visc * s00
    st11 = -P + visc * s11
    st22 = -P + visc * s22
    st01 = visc * s01
    st02 = visc * s02
    st12 = visc * s12
    return _finish(J, (st00, st11, st22, st01, st02, st12), visc, Jinv9,
                   detJ, S, winv, h1order=h1order, cfl=cfl,
                   eig_sweeps=eig_sweeps, visc_over_R=visc / R)


def _finish(J, st, visc, Jinv9, detJ, S, winv, *, h1order, cfl,
            eig_sweeps, visc_over_R=None):
    # shared tail: min-SV dt estimate + stressJinvT assembly
    (j00, j01, j02, j10, j11, j12, j20, j21, j22) = J
    st00, st11, st22, st01, st02, st12 = st
    (i00, i01, i02, i10, i11, i12, i20, i21, i22) = Jinv9

    # min singular value of J via eigenvalues of J^T J (values only)
    t00 = j00**2 + j10**2 + j20**2
    t11 = j01**2 + j11**2 + j21**2
    t22 = j02**2 + j12**2 + j22**2
    t01 = j00 * j01 + j10 * j11 + j20 * j21
    t02 = j00 * j02 + j10 * j12 + j20 * j22
    t12 = j01 * j02 + j11 * j12 + j21 * j22

    # f32-sweep + f64-Rayleigh hybrid (values only): J^T J is exactly
    # degenerate for isotropic elements, where the Rayleigh error
    # vanishes with the gap — dt stays at f64-class parity
    lam, _ = eig3s_hybrid(t00, t11, t22, t01, t02, t12,
                          sweeps=eig_sweeps, want_vector=False)
    sv = jnp.sqrt(jnp.maximum(lam, 0.0))

    one = jnp.ones_like(sv)
    h_min = sv / h1order
    ih = one / h_min
    vR = visc_over_R if visc_over_R is not None else jnp.zeros_like(sv)
    idt = S * ih + 2.5 * vR * ih * ih
    inf = jnp.full_like(sv, jnp.inf)
    dtq = jnp.where(idt > 0.0, cfl / jnp.where(idt > 0.0, idt, one), inf)
    # inverted elements reject the step (laghos_solver.cpp:1144-1148);
    # non-finite qdata (NaN detJ/idt would slip through `<`/`>`
    # comparisons) must reject it the same way, not read as dt = inf
    good = jnp.isfinite(detJ) & (detJ >= 0.0) & ~jnp.isnan(idt)
    dtq = jnp.where(good, dtq, jnp.zeros_like(sv))

    # sJit[gd][vd] = sum_k stress[vd,k] Jinv[gd,k] * w * detJ
    wd = detJ / winv
    stress = ((st00, st01, st02), (st01, st11, st12), (st02, st12, st22))
    Jinv = ((i00, i01, i02), (i10, i11, i12), (i20, i21, i22))
    sJit = []
    for gd in range(3):
        for vd in range(3):
            acc = (stress[vd][0] * Jinv[gd][0]
                   + stress[vd][1] * Jinv[gd][1]
                   + stress[vd][2] * Jinv[gd][2]) * wd
            sJit.append(acc)
    return tuple(sJit), dtq, visc


def physics_2d(J, dV, J0i, e_q, rw, gamma, winv, *, h0_e, h1order, cfl,
               use_viscosity=True, use_vorticity=False):
    """Scalarized 2D pointwise physics (whole-lattice variant).

    J, dV, J0i: 4-tuples of per-point scalar arrays, row-major [a][b]
    with b = 0 the x direction; e_q, rw, winv, h0_e scalar arrays.
    Returns (sJit 4-tuple [gd*2+vd], dtq, visc).  Semantics mirror the
    generic tensor path (ops/qupdate.qupdate, laghos_solver.cpp
    QUpdateBody restricted to dim==2): closed-form 2x2 inverse/eig/
    singular value via ops/smallmat's scalar kernels.
    """
    from .smallmat import eig2_smallest_scalar, min_sv2_scalar

    (j00, j01, j10, j11) = J
    detJ = j00 * j11 - j01 * j10
    idet = 1.0 / detJ
    i00, i01 = j11 * idet, -j01 * idet
    i10, i11 = -j10 * idet, j00 * idet

    R = rw * winv * idet
    E = jnp.maximum(0.0, e_q)
    P = (gamma - 1.0) * R * E
    S = jnp.sqrt(gamma * (gamma - 1.0) * E)

    visc = jnp.zeros_like(R)
    st00 = -P
    st11 = -P
    st01 = jnp.zeros_like(P)
    if use_viscosity:
        (d00, d01, d10, d11) = dV
        # physical velocity gradient sgrad = dV . Jinv
        g00 = d00 * i00 + d01 * i10
        g01 = d00 * i01 + d01 * i11
        g10 = d10 * i00 + d11 * i10
        g11 = d10 * i01 + d11 * i11

        vorticity_coeff = 1.0
        if use_vorticity:
            fro = jnp.sqrt(g00**2 + g01**2 + g10**2 + g11**2)
            div = jnp.abs(g00 + g11)
            vorticity_coeff = jnp.where(
                fro > 0.0, div / jnp.maximum(fro, 1e-300), 1.0)

        s00, s11 = g00, g11
        s01 = 0.5 * (g01 + g10)
        mu, ex, ey = eig2_smallest_scalar(s00, s11, s01)

        # Jpi = J . Jac0inv; ph = Jpi . e
        (o00, o01, o10, o11) = J0i
        p00 = j00 * o00 + j01 * o10
        p01 = j00 * o01 + j01 * o11
        p10 = j10 * o00 + j11 * o10
        p11 = j10 * o01 + j11 * o11
        phx = p00 * ex + p01 * ey
        phy = p10 * ex + p11 * ey
        h = (h0_e * jnp.sqrt(phx**2 + phy**2)
             / jnp.sqrt(ex**2 + ey**2))

        visc = 2.0 * R * h * h * jnp.abs(mu)
        eps = 1e-12
        y = (mu - 2.0 * eps + eps) / (2.0 * eps)
        y = jnp.clip(y, jnp.zeros_like(y), jnp.ones_like(y))
        step = (3.0 - 2.0 * y) * y * y
        visc = visc + (0.5 * R * h * S * vorticity_coeff * (1.0 - step))

        st00 = st00 + visc * s00
        st11 = st11 + visc * s11
        st01 = visc * s01

    # dt estimate from the smallest singular value of J
    sv = min_sv2_scalar(j00, j01, j10, j11)
    h_min = sv / h1order
    one = jnp.ones_like(sv)
    ih = one / h_min
    idt = S * ih + 2.5 * (visc / R) * ih * ih
    inf = jnp.full_like(sv, jnp.inf)
    dtq = jnp.where(idt > 0.0, cfl / jnp.where(idt > 0.0, idt, one), inf)
    good = jnp.isfinite(detJ) & (detJ >= 0.0) & ~jnp.isnan(idt)
    dtq = jnp.where(good, dtq, jnp.zeros_like(sv))

    # sJit[gd*2+vd] = sum_k stress[vd,k] Jinv[gd,k] * w * detJ
    wd = detJ / winv
    stress = ((st00, st01), (st01, st11))
    Jinv = ((i00, i01), (i10, i11))
    sJit = []
    for gd in range(2):
        for vd in range(2):
            sJit.append((stress[vd][0] * Jinv[gd][0]
                         + stress[vd][1] * Jinv[gd][1]) * wd)
    return tuple(sJit), dtq, visc
