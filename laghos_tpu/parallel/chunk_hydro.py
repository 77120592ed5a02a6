"""Unstructured-mesh domain decomposition: SFC element chunks with an
owned-dof boundary exchange (halo mode for non-raster meshes).

The raster-mesh production path (parallel/slab_hydro.py) needs a
Cartesian lattice; this module covers everything else — unstructured
quad/hex meshes — with the same O(surface) communication structure as
the reference's MPI decomposition (laghos_solver.cpp:362-398):

  * elements are partitioned into D contiguous chunks of the
    space-filling-curve order (parallel/partition.py — the same
    geometric-SFC family MFEM uses without METIS), so chunk interfaces
    are small;
  * each device holds ONLY its chunk's dofs (an owned+shared local
    L-vector) — no replicated node vectors, fixing the GSPMD fallback's
    O(ndof) allreduce per CG apply (parallel/sharding.py:48-52);
  * after each local E->L assembly, the dofs shared between chunks are
    summed via ONE boundary buffer: scatter-add local shares into a
    (C, NB) buffer, `psum` it over the device axis, gather the totals
    back — O(boundary) bytes per operator apply, topology-free (no
    per-neighbor message lists, which XLA collectives don't want
    anyway);
  * CG dots weight each dof by a unique owner (`psum`-reduced), the dt
    estimate is `pmin`-reduced, L2/energy data stays element-local —
    exactly the slab path's semantics on an unstructured chunking.

Ragged chunks are padded to a common shape with PHANTOM elements wired
to dedicated phantom dof slots: phantom dofs are flagged essential
(velocity pinned 0), their geometry copies a real element (detJ > 0,
so the dt guard is not tripped), rho0DetJ0w = mass = 0 so they carry
no mass, no force, no energy, and their dt estimate is +inf — padding
never perturbs the physics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import force as fop
from ..ops import mass as mop
from ..ops import qupdate as qop
from ..solvers.cg import cg

AXIS = "dd"


class ChunkHydro:
    """Distributed view of a conforming `Hydro` over SFC element chunks."""

    def __init__(self, hydro, n_devices=None, devices=None):
        h = self.h = hydro
        if not h.p_assembly:
            raise ValueError("chunk mode covers the partial-assembly path")
        if getattr(h, "_simplex", None):
            raise ValueError("chunk mode covers tensor-element meshes")
        devs = devices if devices is not None else jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        D = self.D = len(devs)
        self.mesh = Mesh(np.array(devs), (AXIS,))
        d = h.dim
        NE = h.NE
        gather = np.asarray(h.gather)          # (NE, nd) global dofs
        nd = gather.shape[1]
        self.dtype = h.dtype
        self.NE = NE
        self.ndof = h.ndof

        nel_loc = -(-NE // D)                  # ceil: last chunk padded
        self.nel_loc = nel_loc
        chunks = [np.arange(k * nel_loc, min((k + 1) * nel_loc, NE))
                  for k in range(D)]

        # ---- local dof enumeration (+ nd phantom slots per chunk) ----
        loc_dofs = []                          # global dof ids per chunk
        for els in chunks:
            loc_dofs.append(np.unique(gather[els].reshape(-1)))
        Nreal = max(len(ld) for ld in loc_dofs)
        Nmax = Nreal + nd                      # + phantom dof block
        self.nloc = Nmax

        # shared-dof (chunk boundary) enumeration
        count = np.zeros(h.ndof, np.int32)
        for ld in loc_dofs:
            count[ld] += 1
        shared = np.where(count >= 2)[0]
        NB = len(shared)
        self.NB = NB
        bid = np.full(h.ndof, -1, np.int64)
        bid[shared] = np.arange(NB)
        owner = np.full(h.ndof, -1, np.int64)
        for k in range(D - 1, -1, -1):         # smallest chunk id wins
            owner[loc_dofs[k]] = k

        g2l = []
        loc2b = np.full((D, Nmax), NB, np.int32)   # NB = dump slot
        owned = np.zeros((D, Nmax))
        lgather = np.zeros((D, nel_loc, nd), np.int32)
        for k, (els, ld) in enumerate(zip(chunks, loc_dofs)):
            m = {g: i for i, g in enumerate(ld)}
            g2l.append(m)
            lg = np.vectorize(m.__getitem__)(gather[els]) if len(els) \
                else np.zeros((0, nd), np.int64)
            lgather[k, :len(els)] = lg
            # phantom elements -> the phantom dof block
            lgather[k, len(els):] = Nreal + np.arange(nd)[None, :]
            sh = bid[ld] >= 0
            loc2b[k, :len(ld)][sh] = bid[ld][sh]
            owned[k, :len(ld)] = (owner[ld] == k).astype(np.float64)
        self._loc_dofs = loc_dofs
        self._chunks = chunks

        # local incidence maps for gather-assembly (per chunk, padded
        # to a common max multiplicity)
        incs, msks = [], []
        for k in range(D):
            inc, msk = mop.build_incidence(lgather[k], Nmax)
            incs.append(inc)
            msks.append(msk)
        mmax = max(i.shape[1] for i in incs)
        inc_p = np.zeros((D, Nmax, mmax), np.int32)
        msk_p = np.zeros((D, Nmax, mmax))
        for k in range(D):
            inc_p[k, :, :incs[k].shape[1]] = incs[k]
            msk_p[k, :, :incs[k].shape[1]] = msks[k]

        dt = h.dtype

        def split_elems(A, phantom=None):
            """(NE, ...) -> (D, nel_loc, ...) with phantom fill."""
            A = np.asarray(A)
            out = np.zeros((D, nel_loc) + A.shape[1:], A.dtype)
            for k, els in enumerate(chunks):
                out[k, :len(els)] = A[els]
                if len(els) < nel_loc and phantom is not None:
                    out[k, len(els):] = phantom
            return out

        def slice_dofs(u, phantom=0.0):
            """(C, ndof) -> (D, C, Nmax)."""
            u = np.asarray(u)
            C = u.shape[0]
            out = np.full((D, C, Nmax), float(phantom))
            for k, ld in enumerate(loc_dofs):
                out[k, :, :len(ld)] = u[:, ld]
            return out

        self._slice_dofs = slice_dofs
        self._split_elems = split_elems

        # ---- per-device constants -----------------------------------
        self.lgather = jnp.asarray(lgather)
        self.inc_l = jnp.asarray(inc_p)
        self.incmask_l = jnp.asarray(msk_p, dt)
        self.loc2b = jnp.asarray(loc2b)
        self.owned_l = jnp.asarray(owned, dt)
        self.massD_l = jnp.asarray(split_elems(h.massD, phantom=0.0), dt)
        self.rw_l = jnp.asarray(split_elems(
            h.rho0DetJ0w_j, phantom=1.0), dt)
        self.gamma_l = jnp.asarray(split_elems(
            h.gamma_j, phantom=1.4), dt)
        self.one_l = jnp.asarray(np.ones((D, nel_loc, h.ld)), dt)
        if h._sJ9:
            eye9 = np.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0])
            self.J0i_l = jnp.asarray(np.stack(
                [split_elems(a, phantom=eye9[i])
                 for i, a in enumerate(h.Jac0inv9_j)], axis=1), dt)
        else:
            eye = np.eye(d)
            self.J0i_l = jnp.asarray(split_elems(
                h.Jac0inv_j, phantom=eye), dt)
        # essential mask: global slice + phantom block always essential
        ess = slice_dofs(np.asarray(h.ess_mask_j, np.float64),
                         phantom=1.0)
        ess[:, :, Nreal:] = 1.0
        self.ess_l = jnp.asarray(ess != 0.0)
        dinv = slice_dofs(h.h1_dinv[None, :], phantom=1.0)[:, 0]
        self.dinv_l = jnp.asarray(dinv, dt)
        self.rt_l = (jnp.asarray(slice_dofs(h.rt_rhs), dt)
                     if h.rt_rhs is not None else None)

        # initial state: phantom dofs copy element 0's geometry so
        # phantom Jacobians stay positive-definite forever (v = 0 and
        # zero forces keep them frozen)
        x0 = slice_dofs(h.S0["x"])
        v0 = slice_dofs(h.S0["v"], phantom=0.0)
        x0g = np.asarray(h.S0["x"])[:, gather[0]]       # (d, nd)
        for k in range(D):
            x0[k, :, Nreal:] = x0g
        self.S0 = {
            "x": jnp.asarray(x0, dt),
            "v": jnp.asarray(v0, dt),
            "e": jnp.asarray(split_elems(h.S0["e"], phantom=0.0), dt),
        }
        self._place()
        self._advance_cache = {}
        self._estimate = None
        self._energies = None

    # ------------------------------------------------------------------
    _CONST_NAMES = ("lgather", "inc_l", "incmask_l", "loc2b", "owned_l",
                    "massD_l", "rw_l", "gamma_l", "one_l", "J0i_l",
                    "ess_l", "dinv_l")

    def _place(self):
        sh = NamedSharding(self.mesh, P(AXIS))
        put = partial(jax.device_put, device=sh)
        for name in self._CONST_NAMES:
            setattr(self, name, put(getattr(self, name)))
        if self.rt_l is not None:
            self.rt_l = put(self.rt_l)
        self.S0 = {k: put(v) for k, v in self.S0.items()}

    def _consts(self):
        c = [getattr(self, n) for n in self._CONST_NAMES]
        if self.rt_l is not None:
            c.append(self.rt_l)
        return tuple(c)

    # ---------------- per-device operator set (under shard_map) -------
    def _local_ops(self, consts):
        h = self.h
        d = h.dim
        opt = h.opt
        consts = list(consts)
        (lgather, inc, incmask, loc2b, owned, massD, rw, gamma, one_l2,
         J0i, ess, dinv) = consts[:12]
        rt = consts[12] if self.rt_l is not None else None
        NB = self.NB

        def gather_e(u):
            return u[:, lgather].swapaxes(0, 1)    # (nel, C, nd)

        def halo_fix(y):
            """Sum chunk-shared dof contributions: scatter-add into the
            boundary buffer, psum, gather the totals back."""
            if NB == 0 or self.D == 1:
                return y
            buf = jnp.zeros(y.shape[:-1] + (NB + 1,), y.dtype)
            buf = buf.at[..., loc2b].add(y)
            buf = jax.lax.psum(buf[..., :NB], AXIS)
            tot = jnp.concatenate(
                [buf, jnp.zeros(y.shape[:-1] + (1,), y.dtype)], axis=-1)
            picked = tot[..., loc2b]
            return jnp.where(loc2b[None, :] < NB, picked, y)

        def assemble(u_e):
            y = mop.e_to_l_gather(u_e, inc, incmask)
            return halo_fix(y)

        def pdot(u, v):
            return jax.lax.psum(
                jnp.sum(u * v * owned[None, :], axis=-1), AXIS)

        def edot(u, v):
            return jax.lax.psum(jnp.sum(u * v, axis=-1), AXIS)

        def qupd(Sc):
            x_e = gather_e(Sc["x"])
            v_e = gather_e(Sc["v"])
            if h._sJ9:
                J0i9 = tuple(J0i[a] for a in range(9))
                sJit, dtm = qop.qupdate3d(
                    x_e, v_e, Sc["e"], gamma, rw, J0i9, h.tables, h.h0,
                    h1order=float(opt.order_v), cfl=opt.cfl,
                    use_viscosity=h.use_visc, use_vorticity=h.use_vort,
                    oz=None if h.oz is None else h.oz["qup"])
            else:
                sJit, dtm = qop.qupdate(
                    x_e, v_e, Sc["e"], gamma, rw, J0i, h.tables, h.h0,
                    dim=d, h1order=float(opt.order_v), cfl=opt.cfl,
                    use_viscosity=h.use_visc, use_vorticity=h.use_vort)
            return sJit, jax.lax.pmin(dtm, AXIS)

        def mass_apply(u):
            ue = jnp.swapaxes(gather_e(u), 0, 1)
            ue = mop.mass_apply_e(ue, massD, h.tables["H1B"], d,
                                  Bd=h.tables.get("H1Bd"),
                                  oz=None if h.oz is None else h.oz["h1"])
            y = assemble(ue)
            return jnp.where(ess, 0.0, y)

        def force_rhs(sJit):
            if isinstance(sJit, tuple):
                if h.oz is not None:
                    # f64 production mode: E-form int8-MXU Ozaki
                    # contractions per chunk (the same per-rank kernels
                    # as the conforming Hydro, laghos_solver.cpp:362)
                    Fone = fop.force_mult9_oz(one_l2, sJit, h.oz["force"],
                                              ftz_eps2=h.ftz_eps2)
                else:
                    Fone = fop.force_mult9(one_l2, sJit, h.tables,
                                           ftz_eps2=h.ftz_eps2)
            else:
                Fone = fop.force_mult(one_l2, sJit, h.tables, dim=d,
                                      ftz_eps2=h.ftz_eps2)
            return assemble(jnp.swapaxes(Fone, 0, 1))

        def solve_velocity(sJit, x0=None):
            rhs = -force_rhs(sJit)
            if rt is not None:
                rhs = rhs + rt
            rhs = jnp.where(ess, 0.0, rhs)
            res = cg(mass_apply, rhs, opt.cg_tol, opt.cg_max_iter,
                     precond=lambda r: r * dinv, dot=pdot, x0=x0)
            return res.x, jnp.sum(res.iters)

        def force_T(sJit, v):
            v_e = gather_e(v)
            if isinstance(sJit, tuple):
                if h.oz is not None:
                    return fop.force_mult_transpose9_oz(v_e, sJit,
                                                        h.oz["forceT"])
                return fop.force_mult_transpose9(v_e, sJit, h.tables)
            return fop.force_mult_transpose(v_e, sJit, h.tables, dim=d)

        def taylor_source(Sc):
            from ..ops import smallmat, tensor as top

            x_e = gather_e(Sc["x"])
            J = qop.jacobians(x_e, h.tables["H1B"], h.tables["H1G"], d)
            detJ = smallmat.det(J, d)
            ne_loc = x_e.shape[0]
            xt = x_e.reshape((ne_loc, d) + (h.nd1,) * d)
            xq = top.eval_values(xt, h.tables["H1B"], d).reshape(
                ne_loc, d, h.NQ)
            X, Y = xq[:, 0], xq[:, 1]
            pi = jnp.pi
            fq_ = (3.0 / 8.0) * pi * (
                jnp.cos(3 * pi * X) * jnp.cos(pi * Y)
                - jnp.cos(pi * X) * jnp.cos(3 * pi * Y))
            integrand = h.tables["W"][None, :] * detJ * fq_
            it = integrand.reshape((ne_loc,) + (h.nq1,) * d)
            out = top.eval_transpose(it, h.tables["L2B"].T, d)
            return out.reshape(ne_loc, h.ld)

        def solve_energy(Sc, sJit, v, x0=None):
            e_rhs = force_T(sJit, v)
            if h.source == 1:
                e_rhs = e_rhs + taylor_source(Sc)

            def apply_A(u):
                ue = u.reshape(e_rhs.shape)
                ue = mop.mass_apply_e(
                    ue, massD, h.tables["L2B"], d,
                    Bd=h.tables.get("L2Bd"),
                    oz=None if h.oz is None else h.oz["l2"])
                return ue.reshape(1, -1)

            res = cg(apply_A, e_rhs.reshape(1, -1), opt.cg_tol,
                     opt.cg_max_iter, dot=edot,
                     x0=None if x0 is None else x0.reshape(1, -1))
            iters = jnp.maximum(res.iters[0], 1)
            return res.x.reshape(e_rhs.shape), iters

        return dict(qupd=qupd, solve_velocity=solve_velocity,
                    solve_energy=solve_energy, owned=owned, edot=edot)

    # -- the advance/dt/energies drivers mirror parallel/slab_hydro.py --
    def _make_advance(self, count_stage1: bool, with_sj: bool):
        h = self.h
        consts = self._consts()

        def prog(S, dtv, sj, *consts_in):
            cl = [c[0] for c in consts_in]
            ops = self._local_ops(cl)
            Sl = {k: v[0] for k, v in S.items()}
            sjl = (None if sj is None else
                   tuple(a[0] for a in sj) if isinstance(sj, tuple)
                   else sj[0])
            warm = {} if h.opt.cg_warm_start else None

            def mult(Sc, sJit=None):
                if sJit is None:
                    sJit, dtm = ops["qupd"](Sc)
                else:
                    dtm = jnp.asarray(jnp.inf, self.dtype)
                x0v = warm.get("dv") if warm is not None else None
                x0e = warm.get("de") if warm is not None else None
                dv, h1it = ops["solve_velocity"](sJit, x0=x0v)
                de, l2it = ops["solve_energy"](Sc, sJit, Sc["v"], x0=x0e)
                if warm is not None:
                    warm["dv"], warm["de"] = dv, de
                return {"x": Sc["v"], "v": dv, "e": de}, dtm, (h1it, l2it)

            first = [sjl]

            def rk2avg_stage(Scur, v0, dtt):
                if first[0] is not None:
                    sJit, dtm = first[0], jnp.asarray(jnp.inf, self.dtype)
                    first[0] = None
                else:
                    sJit, dtm = ops["qupd"](Scur)
                x0v = warm.get("dv") if warm is not None else None
                x0e = warm.get("de") if warm is not None else None
                dv, h1it = ops["solve_velocity"](sJit, x0=x0v)
                V = v0 + 0.5 * dtt * dv
                de, l2it = ops["solve_energy"](Scur, sJit, V, x0=x0e)
                if warm is not None:
                    warm["dv"], warm["de"] = dv, de
                return {"x": V, "v": dv, "e": de}, dtm, (h1it, l2it)

            S_new, dtacc, stats = h._step(
                Sl, dtv, count_stage1, mult=mult,
                rk2avg_stage=rk2avg_stage,
                mult1=(lambda Sc: mult(Sc, sjl))
                if (sjl is not None and not count_stage1) else None)
            sj_new, dt_final = ops["qupd"](S_new)
            dt_est = jnp.minimum(dtacc, dt_final)
            loc = (jnp.sum(S_new["v"]) + jnp.sum(S_new["e"])
                   + jnp.sum(S_new["x"]))
            ok = jnp.isfinite(jax.lax.psum(loc, AXIS))
            dt_est = jnp.where(ok, dt_est, 0.0)
            S_out = {k: v[None] for k, v in S_new.items()}
            sj_out = (tuple(a[None] for a in sj_new)
                      if isinstance(sj_new, tuple) else sj_new[None])
            return S_out, dt_est, stats, sj_out

        n_c = len(consts)
        if with_sj:
            entry = prog
            in_specs = (P(AXIS), P(), P(AXIS)) + (P(AXIS),) * n_c
        else:
            def entry(S, dtv, *cc):
                return prog(S, dtv, None, *cc)
            in_specs = (P(AXIS), P()) + (P(AXIS),) * n_c
        smapped = shard_map(entry, mesh=self.mesh, in_specs=in_specs,
                            out_specs=(P(AXIS), P(), P(), P(AXIS)),
                            check_vma=False)
        if with_sj:
            return jax.jit(smapped, donate_argnums=(2,))
        return jax.jit(smapped)

    def advance(self, S, dt, count_stage1=False, sJit1=None):
        key = (bool(count_stage1), sJit1 is not None)
        if key not in self._advance_cache:
            self._advance_cache[key] = self._make_advance(*key)
        fn = self._advance_cache[key]
        dtv = jnp.asarray(dt, self.dtype)
        if key[1]:
            return fn(S, dtv, sJit1, *self._consts())
        return fn(S, dtv, *self._consts())

    def dt_estimate_full(self, S):
        if self._estimate is None:
            consts = self._consts()
            n_c = len(consts)

            def prog(S, *cc):
                cl = [c[0] for c in cc]
                ops = self._local_ops(cl)
                Sl = {k: v[0] for k, v in S.items()}
                sj, dtm = ops["qupd"](Sl)
                sj_out = (tuple(a[None] for a in sj)
                          if isinstance(sj, tuple) else sj[None])
                return dtm, sj_out

            self._estimate = jax.jit(shard_map(
                prog, mesh=self.mesh,
                in_specs=(P(AXIS),) + (P(AXIS),) * n_c,
                out_specs=(P(), P(AXIS)), check_vma=False))
        return self._estimate(S, *self._consts())

    def dt_estimate(self, S):
        return self.dt_estimate_full(S)[0]

    def run_segment(self, S, t, dt, ti, steps, sj, count_stage1,
                    t_final, max_steps, vis_steps, chk):
        """On-device adaptive-dt segment over the device mesh (one host
        sync per vis pause; parallel/segment.py)."""
        from .segment import run_segment as _rs

        return _rs(self, S, t, dt, ti, steps, sj, count_stage1,
                   t_final, max_steps, vis_steps, chk)

    def energies(self, S):
        if self._energies is None:
            h = self.h
            d = h.dim

            def prog(S, rw, lg):
                from ..ops import tensor as top

                Sl = {k: v[0] for k, v in S.items()}
                rwl, lgl = rw[0], lg[0]
                ne_loc = Sl["e"].shape[0]
                et = Sl["e"].reshape((ne_loc,) + (h.l1d,) * d)
                e_q = top.eval_values(et, h.tables["L2B"], d).reshape(
                    ne_loc, h.NQ)
                # phantom elements carry e = 0 / v = 0: no contribution
                ie = jax.lax.psum(jnp.sum(rwl * e_q), AXIS)
                v_e = Sl["v"][:, lgl].swapaxes(0, 1)
                vt = v_e.reshape((ne_loc, d) + (h.nd1,) * d)
                v_q = top.eval_values(vt, h.tables["H1B"], d).reshape(
                    ne_loc, d, h.NQ)
                ke = jax.lax.psum(
                    0.5 * jnp.sum(rwl * jnp.sum(v_q**2, axis=1)), AXIS)
                return ie, ke

            self._energies = jax.jit(shard_map(
                prog, mesh=self.mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(), P()), check_vma=False))
        return self._energies(S, self.rw_l, self.lgather)

    def e_norm(self, S):
        # chunks may be ragged; sum real elements only
        tot = 0.0
        for k, els in enumerate(self._chunks):
            tot += float((np.asarray(S["e"])[k, :len(els)] ** 2).sum())
        return float(np.sqrt(tot))

    def to_global(self, S):
        """Local (D, ...) state -> global (conforming Hydro layout)."""
        d = self.h.dim
        x = np.zeros((d, self.ndof))
        v = np.zeros_like(x)
        for k, ld in enumerate(self._loc_dofs):
            x[:, ld] = np.asarray(S["x"][k])[:, :len(ld)]
            v[:, ld] = np.asarray(S["v"][k])[:, :len(ld)]
        e = np.zeros((self.NE, self.h.ld))
        for k, els in enumerate(self._chunks):
            e[els] = np.asarray(S["e"][k])[:len(els)]
        return {"x": x, "v": v, "e": e}
