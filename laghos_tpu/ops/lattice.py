"""Whole-lattice banded-operator contractions on raster Cartesian meshes.

On a raster-renumbered Cartesian mesh the H1 L-vector IS a dense
(Lz, Ly, Lx) lattice (x fastest), L = n*p + 1 per axis.  The per-axis
dof->qpoint evaluation is then one BANDED matrix T (L, n*nq) with
T[e*p + a, e*nq + q] = B1d[q, a] — the element overlap (shared boundary
nodes) lands in distinct columns, and the transpose T^T performs the
scatter-add across elements implicitly.  A full PA mass apply becomes

    y = Tz' Ty' Tx' ( D  *  Tx Ty Tz u )        (6 dot_generals + 1 mul)

with NO gather, NO scatter, NO E-form intermediates.  This trades ~10x
more FLOPs for pure MXU work: the TPU has two orders of magnitude more
matmul throughput than HBM bandwidth or vector-shuffle throughput, so
the banded-dense form beats the sum-factorized gather/scatter pipeline
at production sizes (measured; see STATUS.md).  Reference counterpart:
the MassPAOperator apply chain (laghos_assembly.cpp:145-514).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def banded_eval_table(B1d: np.ndarray, n: int) -> np.ndarray:
    """(L, Q) banded dof->qpoint table for n elements along one axis.

    B1d: (nq, p+1) 1D basis values at the element quadrature points.
    """
    nq, nd1 = B1d.shape
    p = nd1 - 1
    L, Q = n * p + 1, n * nq
    T = np.zeros((L, Q))
    for e in range(n):
        for a in range(nd1):
            T[e * p + a, e * nq:(e + 1) * nq] = B1d[:, a]
    return T


def qlattice_weights(w_eq: np.ndarray, dims: tuple, nq1: int) -> np.ndarray:
    """Per-element qpoint weights (NE, nq1**d), raster element order,
    lex qpoint order -> dense q-lattice (Qz, Qy, Qx) (or 2D/1D)."""
    d = len(dims)
    NE = int(np.prod(dims))
    out = w_eq.reshape(tuple(reversed(dims)) + (nq1,) * d)
    # axes now (ez, ey, ex, qz?, ...): qpoint lex order is x fastest ->
    # (q_last=x ... q_first=z); interleave element and intra-element axes
    # per dimension: target (ez, qz, ey, qy, ex, qx)
    src = list(range(2 * d))
    # current order: e_rev (d axes, z..x) then q axes (z..x? lex x-fastest
    # means LAST q axis is x when reshaped (nq1,)*d in C order with x
    # fastest -> axes are (qz, qy, qx) if the flat index is
    # qz*nq^2 + qy*nq + qx; our W/lex order is x fastest: flat =
    # qx + nq*qy + nq^2*qz -> reshape (nq,)*d gives (qz, qy, qx). OK.)
    perm = []
    for k in range(d):
        perm += [k, d + k]
    out = np.transpose(out, perm)
    shape = tuple(dims[d - 1 - k] * nq1 for k in range(d))
    return out.reshape(shape)


def mass_apply_lattice(uL, Ts, Dq, lat_dims):
    """PA mass apply on the raster lattice.

    uL: (C, ndof) raster-numbered L-vector; Ts: per-axis banded tables
    ordered (z, y, x) as jnp arrays; Dq: dense q-lattice weights
    (rho0DetJ0w at qpoints); lat_dims: (Lz, Ly, Lx).
    Returns (C, ndof).
    """
    C = uL.shape[0]
    d = len(lat_dims)
    u = uL.reshape((C,) + tuple(lat_dims))
    q = u
    # forward: contract lattice axis k with T_k (L_k, Q_k)
    for k in range(d):
        ax = 1 + k
        q = jnp.moveaxis(
            jnp.tensordot(q, Ts[k], axes=[[ax], [0]]), -1, ax)
    q = q * Dq[None]
    for k in range(d):
        ax = 1 + k
        q = jnp.moveaxis(
            jnp.tensordot(q, Ts[k], axes=[[ax], [1]]), -1, ax)
    return q.reshape(C, -1)


def banded_grad_table(G1d: np.ndarray, n: int) -> np.ndarray:
    """(L, Q) banded dof->qpoint DERIVATIVE table (same layout as
    banded_eval_table with the 1D gradient basis)."""
    return banded_eval_table(G1d, n)


def _contract(q, T, ax, side):
    """Contract lattice axis `ax` with T; side 0 = forward (L->Q),
    side 1 = transpose (Q->L)."""
    return jnp.moveaxis(jnp.tensordot(q, T, axes=[[ax], [side]]), -1, ax)


def grad9_lattice(u3, TB, TG):
    """All nine first derivatives of a vector lattice field.

    u3: (3, Lz, Ly, Lx); TB/TG: per-axis (z, y, x) banded value/gradient
    tables.  Returns tuple J[a*3+b] = d u_a / d xi_b on the q-lattice,
    sharing the partial contractions (8 matmuls per component)."""
    out = []
    for a in range(3):
        u = u3[a]
        tzB = jnp.tensordot(u, TB[0], axes=[[0], [0]])   # (y, x, Qz)
        tzG = jnp.tensordot(u, TG[0], axes=[[0], [0]])
        # contract y (axis 0 now), keep (x, Qz, Qy)
        tBB = jnp.tensordot(tzB, TB[1], axes=[[0], [0]])  # (x, Qz, Qy)
        tBG = jnp.tensordot(tzB, TG[1], axes=[[0], [0]])
        tGB = jnp.tensordot(tzG, TB[1], axes=[[0], [0]])
        # contract x (axis 0), output (Qz, Qy, Qx)
        d_x = jnp.tensordot(tBB, TG[2], axes=[[0], [0]])
        d_y = jnp.tensordot(tBG, TB[2], axes=[[0], [0]])
        d_z = jnp.tensordot(tGB, TB[2], axes=[[0], [0]])
        # order J[a*3+b] = d u_a / d xi_b with b=0 the x direction
        # (matching ops/tensor.eval_gradient_dir's convention)
        out += [d_x, d_y, d_z]
    return tuple(out)


def force_one_lattice(sJ, TB, TG):
    """(F . 1) on the H1 lattice from q-lattice stress data.

    sJ: 9-tuple q-lattice sJit[gd*3+vd] (gd = reference direction,
    vd = velocity component; see ops/qphys._finish).  Returns
    (3, Lz, Ly, Lx): y[vd] = sum_gd chain_gd^T sJ[gd*3+vd]."""
    ys = []
    for vd in range(3):
        acc = None
        for gd in range(3):
            s = sJ[gd * 3 + vd]
            # reverse chain: gradient table on axis gd (x-fastest
            # convention: gd=0 -> x axis = lattice axis 2)
            Tz = TG[0] if gd == 2 else TB[0]
            Ty = TG[1] if gd == 1 else TB[1]
            Tx = TG[2] if gd == 0 else TB[2]
            t = jnp.tensordot(s, Tz, axes=[[0], [1]])    # (Qy, Qx, Lz)
            t = jnp.tensordot(t, Ty, axes=[[0], [1]])    # (Qx, Lz, Ly)
            t = jnp.tensordot(t, Tx, axes=[[0], [1]])    # (Lz, Ly, Lx)
            acc = t if acc is None else acc + t
        ys.append(acc)
    return jnp.stack(ys, axis=0)


def grad4_lattice(u2, TB, TG):
    """All four first derivatives of a 2-vector lattice field.

    u2: (2, Ly, Lx); TB/TG: per-axis (y, x) banded value/gradient
    tables.  Returns tuple J[a*2+b] = d u_a / d xi_b on the q-lattice
    with b = 0 the x direction (lattice axis 1), matching
    grad9_lattice's convention."""
    out = []
    for a in range(2):
        u = u2[a]
        tyB = jnp.tensordot(u, TB[0], axes=[[0], [0]])   # (x, Qy)
        tyG = jnp.tensordot(u, TG[0], axes=[[0], [0]])
        d_x = jnp.tensordot(tyB, TG[1], axes=[[0], [0]])  # (Qy, Qx)
        d_y = jnp.tensordot(tyG, TB[1], axes=[[0], [0]])
        out += [d_x, d_y]
    return tuple(out)


def force_one_lattice_2d(sJ, TB, TG):
    """(F . 1) on the H1 lattice from 2D q-lattice stress data.

    sJ: 4-tuple sJit[gd*2+vd]; returns (2, Ly, Lx)."""
    ys = []
    for vd in range(2):
        acc = None
        for gd in range(2):
            s = sJ[gd * 2 + vd]
            Ty = TG[0] if gd == 1 else TB[0]
            Tx = TG[1] if gd == 0 else TB[1]
            t = jnp.tensordot(s, Ty, axes=[[0], [1]])    # (Qx, Ly)
            t = jnp.tensordot(t, Tx, axes=[[0], [1]])    # (Ly, Lx)
            acc = t if acc is None else acc + t
        ys.append(acc)
    return jnp.stack(ys, axis=0)


def qlattice_to_eq_2d(q, dims, nq1):
    """Dense q-lattice (Qy, Qx) -> per-element (NE, NQ)."""
    ny, nx = dims[1], dims[0]
    t = q.reshape(ny, nq1, nx, nq1)
    t = jnp.transpose(t, (0, 2, 1, 3))
    return t.reshape(ny * nx, nq1 ** 2)


def eq_to_qlattice_2d(x, dims, nq1):
    """Per-element (NE, NQ) -> dense q-lattice (Qy, Qx)."""
    ny, nx = dims[1], dims[0]
    t = x.reshape(ny, nx, nq1, nq1)
    t = jnp.transpose(t, (0, 2, 1, 3))
    return t.reshape(ny * nq1, nx * nq1)


def qupdate2d_lattice(xL, vL, e_b, lat, lat_dims, edims, tables, *,
                      h1order, cfl, use_viscosity, use_vorticity):
    """Whole-lattice 2D qupdate: banded-matmul gradients feeding the
    scalarized 2D pointwise physics (ops/qphys.physics_2d).

    Returns (sJit 4-tuple of q-lattice arrays, dt_est)."""
    from . import qphys
    from . import tensor

    nq1 = tables["H1B"].shape[0]
    l1d = tables["L2B"].shape[1]
    TB, TG = lat["Ts"], lat["Tg"]
    x2 = xL.reshape((2,) + tuple(lat_dims))
    J4 = grad4_lattice(x2, TB, TG)
    et = e_b.reshape((e_b.shape[0],) + (l1d,) * 2)
    e_q = tensor.eval_values(et, tables["L2B"], 2).reshape(
        e_b.shape[0], nq1 ** 2)
    e_q = eq_to_qlattice_2d(e_q, edims, nq1)
    if use_viscosity:
        v2 = vL.reshape((2,) + tuple(lat_dims))
        dV4 = grad4_lattice(v2, TB, TG)
    else:
        dV4 = tuple(jnp.zeros_like(e_q) for _ in range(4))
    sJit4, dtq, _ = qphys.physics_2d(
        J4, dV4, lat["J0i4"], e_q, lat["rw"], lat["gam"], lat["winv"],
        h0_e=lat["h0e"], h1order=h1order, cfl=cfl,
        use_viscosity=use_viscosity, use_vorticity=use_vorticity)
    return sJit4, jnp.min(dtq)


def force_transpose_lattice_2d(vL, sJ, lat, lat_dims, edims, tables):
    """F^T . v from 2D q-lattice stress data: e_rhs (NE, ld)."""
    from . import tensor

    nq1 = tables["H1B"].shape[0]
    v2 = vL.reshape((2,) + tuple(lat_dims))
    dV4 = grad4_lattice(v2, lat["Ts"], lat["Tg"])
    eq = None
    for gd in range(2):
        for vd in range(2):
            term = dV4[vd * 2 + gd] * sJ[gd * 2 + vd]
            eq = term if eq is None else eq + term
    eq = qlattice_to_eq_2d(eq, edims, nq1)
    et = eq.reshape((eq.shape[0],) + (nq1,) * 2)
    out = tensor.eval_transpose(et, tables["L2B"].T, 2)
    return out.reshape(eq.shape[0], -1)


def qlattice_to_eq(q, dims, nq1):
    """Dense q-lattice (Qz, Qy, Qx) -> per-element (NE, NQ) (raster
    element order, lex qpoint order)."""
    nz, ny, nx = dims[2], dims[1], dims[0]
    t = q.reshape(nz, nq1, ny, nq1, nx, nq1)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5))
    return t.reshape(nz * ny * nx, nq1 ** 3)


def eq_to_qlattice(x, dims, nq1):
    """Per-element (NE, NQ) -> dense q-lattice (Qz, Qy, Qx)."""
    nz, ny, nx = dims[2], dims[1], dims[0]
    t = x.reshape(nz, ny, nx, nq1, nq1, nq1)
    t = jnp.transpose(t, (0, 3, 1, 4, 2, 5))
    return t.reshape(nz * nq1, ny * nq1, nx * nq1)


def qupdate3d_lattice(xL, vL, e_b, lat, lat_dims, edims, tables, *,
                      h1order, cfl, use_viscosity, use_vorticity,
                      pallas=False, h0=None, interpret=False, oz=None,
                      df64=None):
    """Whole-lattice 3D qupdate: banded-matmul gradients feeding the
    scalarized pointwise physics (ops/qphys.py) on q-lattice arrays.

    xL/vL: (3, ndof) raster L-vectors; e_b: (NE, ld) L2 dofs; lat: the
    precomputed lattice ctx (tables + q-lattice qdata).  With `oz`
    (an ops/lattice_oz build) the gradients run as f64-accurate
    int8-MXU banded chains.  Returns (sJit9 q-lattice tuple, dt_est).
    """
    from . import qphys
    from . import tensor

    nq1 = tables["H1B"].shape[0]
    l1d = tables["L2B"].shape[1]
    TB, TG = lat["Ts"], lat["Tg"]
    x3 = xL.reshape((3,) + tuple(lat_dims))
    v3 = vL.reshape((3,) + tuple(lat_dims))
    if oz is not None:
        from . import lattice_oz as lzo

        if use_viscosity:
            J9, dV9 = lzo.grad18_lattice_oz(x3, v3, oz)
        else:
            J9 = lzo.grad9_lattice_oz(x3, oz)
            dV9 = tuple(jnp.zeros_like(J9[0]) for _ in range(9))
        e_q = lzo.l2_eval_oz(e_b, oz)
        e_q = eq_to_qlattice(e_q, edims, nq1)
        if df64 is not None and use_viscosity:
            # fused double-float Pallas physics: the whole ~300-op
            # pointwise chain stays VMEM-resident as two-f32 pairs
            # instead of round-tripping XLA's emulated-f64
            # intermediates through HBM (ops/pallas_df64.py)
            from . import pallas_df64

            sJit9, dtq = pallas_df64.physics_3d_df64(
                J9, dV9, lat["J0i9"], e_q, lat["rw"], lat["gam"],
                lat["winv"], lat["h0e"], h1order=h1order, cfl=cfl,
                use_vorticity=use_vorticity,
                bm=df64.get("bm", 32),
                interpret=df64.get("interpret", False))
            return sJit9, jnp.min(dtq)
        sJit9, dtq, _ = qphys.physics_3d(
            J9, dV9, lat["J0i9"], e_q, lat["rw"], lat["gam"],
            lat["winv"], h0_e=lat["h0e"], h1order=h1order, cfl=cfl,
            use_viscosity=use_viscosity, use_vorticity=use_vorticity)
        return sJit9, jnp.min(dtq)
    J9 = grad9_lattice(x3, TB, TG)
    # L2 energy stays per-element (discontinuous); rearrange to lattice
    et = e_b.reshape((e_b.shape[0],) + (l1d,) * 3)
    e_q = tensor.eval_values(et, tables["L2B"], 3).reshape(
        e_b.shape[0], nq1 ** 3)
    e_q = eq_to_qlattice(e_q, edims, nq1)
    if not use_viscosity:
        zero9 = tuple(jnp.zeros_like(e_q) for _ in range(9))
        sJit9, dtq, _ = qphys.physics_3d(
            J9, zero9, lat["J0i9"], e_q, lat["rw"], lat["gam"],
            lat["winv"], h0_e=lat["h0e"], h1order=h1order, cfl=cfl,
            use_viscosity=False, use_vorticity=False)
    elif pallas:
        # fused Pallas VPU physics on the dense q-lattice: every operand
        # passes as its own same-shaped 2D ref (no packing copies)
        from . import pallas_qphys

        Q = e_q.shape
        r2 = lambda a: a.reshape(Q[0] * Q[1], Q[2])  # noqa: E731
        dV9 = grad9_lattice(v3, TB, TG)
        sJit9, dtq, _ = pallas_qphys.physics_3d_pallas_flat(
            tuple(r2(a) for a in J9), tuple(r2(a) for a in dV9),
            tuple(r2(a) for a in lat["J0i9"]), r2(e_q), r2(lat["rw"]),
            r2(lat["gam"]), r2(lat["winv"]), h0=h0, h1order=h1order,
            cfl=cfl, use_vorticity=use_vorticity, interpret=interpret)
        sJit9 = tuple(a.reshape(Q) for a in sJit9)
    else:
        dV9 = grad9_lattice(v3, TB, TG)
        sJit9, dtq, _ = qphys.physics_3d(
            J9, dV9, lat["J0i9"], e_q, lat["rw"], lat["gam"],
            lat["winv"], h0_e=lat["h0e"], h1order=h1order, cfl=cfl,
            use_vorticity=use_vorticity)
    return sJit9, jnp.min(dtq)


def force_transpose_lattice(vL, sJ, lat, lat_dims, edims, tables,
                            oz=None, oz_slices=None):
    """F^T . v from q-lattice stress data: e_rhs (NE, ld)."""
    from . import tensor

    nq1 = tables["H1B"].shape[0]
    v3 = vL.reshape((3,) + tuple(lat_dims))
    if oz is not None:
        from . import lattice_oz as lzo

        dV9 = lzo.grad9_lattice_oz(v3, oz, n_slices=oz_slices)
    else:
        dV9 = grad9_lattice(v3, lat["Ts"], lat["Tg"])
    eq = None
    for gd in range(3):
        for vd in range(3):
            term = dV9[vd * 3 + gd] * sJ[gd * 3 + vd]
            eq = term if eq is None else eq + term
    eq = qlattice_to_eq(eq, edims, nq1)
    if oz is not None:
        from . import lattice_oz as lzo

        return lzo.l2_transpose_oz(eq, oz, n_slices=oz_slices)
    et = eq.reshape((eq.shape[0],) + (nq1,) * 3)
    out = tensor.eval_transpose(et, tables["L2B"].T, 3)
    return out.reshape(eq.shape[0], -1)


def kron_mass_factors(Dq: np.ndarray, Ts_np: tuple) -> list:
    """Per-axis 1D mass factor matrices from a rank-1 separable
    approximation of the q-lattice weights.

    The lattice mass operator is  M = (Tz' (.) Tz)(Ty' ...)(Tx' ...)
    coupled only through Dq; if Dq[i,j,k] = wz[i]*wy[j]*wx[k] then M is
    EXACTLY the Kronecker product  Az (x) Ay (x) Ax  with
    A_k = T_k diag(w_k) T_k'.  The best separable approximation in log
    space (Dq > 0 always: quadrature weight x rho0 x detJ0) is the
    per-axis mean of log Dq — exact whenever rho0*detJ0 is separable
    (any problem with constant rho0 on an affine raster mesh, e.g. the
    Sedov benchmarks).  Since the Lagrangian mass matrix never changes
    in time (laghos_solver.cpp:178: rho0*detJ0 at t=0), the factors are
    built once.  Returns [(A_k, relerr)] per lattice axis (z, y, x)."""
    d = Dq.ndim
    L = np.log(Dq)
    m = float(L.mean())
    ws = []
    for k in range(d):
        other = tuple(a for a in range(d) if a != k)
        ws.append(np.exp(L.mean(axis=other) - (d - 1) / d * m))
    approx = ws[0]
    for k in range(1, d):
        approx = np.multiply.outer(approx, ws[k])
    relerr = float(np.max(np.abs(Dq - approx) / Dq))
    return [(T @ np.diag(w) @ T.T, relerr)
            for T, w in zip(Ts_np, ws)]


def build_kron_precond(ess_mask: np.ndarray, lat_dims: tuple,
                       Dq: np.ndarray, Ts_np: tuple):
    """Per-component per-axis inverse mass factors for the Kronecker
    velocity-mass preconditioner.

    Essential BCs break the pure Kronecker structure UNLESS each
    component's free-dof set is a Cartesian product of per-axis index
    sets (true for v.n = 0 on box boundaries: component c is
    constrained exactly on the two lattice planes of axis c).  When the
    product property holds, the constrained operator is still a
    Kronecker product of restricted factors, so its exact inverse is
    the Kronecker product of restricted dense inverses (embedded back
    with zero rows/cols on constrained dofs -> SPD on the free
    subspace, and CG residuals are identically zero on constrained
    dofs).  Returns (mats, relerr) with mats[k] of shape (C, L_k, L_k),
    or None if any component's mask is not an axis product."""
    C = ess_mask.shape[0]
    d = len(lat_dims)
    factors = kron_mass_factors(Dq, Ts_np)
    relerr = factors[0][1]
    mats = [np.zeros((C, Lk, Lk)) for Lk in lat_dims]
    cache = {}
    for c in range(C):
        free = ~ess_mask[c].reshape(lat_dims)
        fs = []
        for k in range(d):
            other = tuple(a for a in range(d) if a != k)
            fs.append(free.any(axis=other))
        prod = fs[0]
        for k in range(1, d):
            prod = np.multiply.outer(prod, fs[k])
        if not np.array_equal(free, prod):
            return None
        for k in range(d):
            key = (k, fs[k].tobytes())
            if key not in cache:
                A, _ = factors[k]
                idx = np.where(fs[k])[0]
                Minv = np.zeros_like(A)
                Minv[np.ix_(idx, idx)] = np.linalg.inv(A[np.ix_(idx, idx)])
                cache[key] = Minv
            mats[k][c] = cache[key]
    return mats, relerr


def kron_precond_apply(r, mats, lat_dims):
    """Apply the per-component Kronecker inverse: one small dense
    matmul per lattice axis (pure MXU, no gather/scatter)."""
    C = r.shape[0]
    u = r.reshape((C,) + tuple(lat_dims))
    for k, P in enumerate(mats):
        u = jnp.moveaxis(u, 1 + k, -1)
        u = jnp.einsum("c...j,cij->c...i", u, P)
        u = jnp.moveaxis(u, -1, 1 + k)
    return u.reshape(C, -1)


def build_lattice_ops(hydro):
    """Precompute banded tables + q-lattice weights for a Hydro on a
    raster mesh; returns dict or None if the mesh is not raster."""
    sm = getattr(hydro, "_sm", None)
    if sm is None or not sm.identity_perm:
        return None
    dims = sm.dims                  # elements per axis, x-fastest order?
    d = len(dims)
    B = np.asarray(hydro.tables["H1B"], dtype=np.float64)
    # dims from StructMaps are (nx, ny, nz) x-first; lattice axes are
    # (z, y, x) in the raster numbering (x fastest)
    n_zyx = tuple(reversed(dims))
    Ts_np = tuple(banded_eval_table(B, n) for n in n_zyx)
    Ts = tuple(jnp.asarray(T, hydro.dtype) for T in Ts_np)
    Dq = qlattice_weights(np.asarray(hydro.massD, dtype=np.float64),
                          dims, hydro.nq1)
    lat_dims = tuple(n * hydro.opt.order_v + 1 for n in n_zyx)
    out = {
        "Ts": Ts,
        "Dq": jnp.asarray(Dq, hydro.dtype),
        "lat_dims": lat_dims,
    }
    if hydro.opt.precond in ("auto", "kron"):
        kb = build_kron_precond(np.asarray(hydro.ess_mask, bool),
                                lat_dims, Dq, Ts_np)
        if kb is not None:
            mats, relerr = kb
            out["kron"] = tuple(jnp.asarray(Mk, hydro.dtype)
                                for Mk in mats)
            out["kron_relerr"] = relerr
    if d in (2, 3):
        # full lattice qupdate/force pipeline: gradient tables + every
        # per-qpoint constant re-arranged onto the q-lattice
        G = np.asarray(hydro.tables["H1G"], dtype=np.float64)
        nq1 = hydro.nq1
        NE, NQ = hydro.NE, hydro.NQ
        W = np.asarray(hydro.tables["W"], dtype=np.float64)
        ql = lambda a: jnp.asarray(  # noqa: E731
            qlattice_weights(np.asarray(a, dtype=np.float64), dims, nq1),
            hydro.dtype)
        out["Tg"] = tuple(
            jnp.asarray(banded_grad_table(G, n), hydro.dtype)
            for n in n_zyx)
        out["rw"] = ql(hydro.rho0DetJ0w)
        out["gam"] = ql(np.broadcast_to(
            np.asarray(hydro.gamma_j, dtype=np.float64)[:, None],
            (NE, NQ)))
        out["winv"] = ql(np.broadcast_to(1.0 / W[None, :], (NE, NQ)))
        out["h0e"] = ql(np.full((NE, NQ), float(hydro.h0)))
        out["J0i" + ("9" if d == 3 else "4")] = tuple(
            ql(hydro.Jac0inv[..., a, b])
            for a in range(d) for b in range(d))
    return out
