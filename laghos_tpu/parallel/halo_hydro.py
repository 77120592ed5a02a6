"""Halo-distributed hydro: the full RK step as one shard_map program.

Wraps a (host-built) conforming `Hydro` into per-device local data via
`HaloLayout` and runs advance entirely inside `shard_map` over a 1D
device mesh: per-element kernels on local slabs, `ppermute` interface
assembly, `psum` CG dots, `pmin` dt — the TPU-native image of the
reference's MPI loop structure (SURVEY §2.5).

Scope (the benchmark/scaling configuration): partial assembly, RK4,
problems without source terms (e.g. the Sedov flagship).
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
from .halo import HaloLayout, build_layout, gather_global, halo_exchange_add, \
    scatter_global


class HaloHydro:
    def __init__(self, hydro, n_devices=None, devices=None):
        assert hydro.p_assembly and hydro.source == 0, \
            "halo mode covers the PA/no-source configurations"
        assert hydro.opt.ode_solver == 4, "halo mode: RK4"
        self.h = hydro
        devs = devices if devices is not None else jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        self.D = len(devs)
        self.mesh = Mesh(np.array(devs), ("dd",))
        lay = self.layout = build_layout(hydro.h1, self.D)
        d = hydro.dim

        # --- per-device local constants ---------------------------------
        ne_loc = lay.ne_loc
        NE = hydro.NE

        def pad_elem(A):
            """(NE, ...) -> (D, ne_loc, ...) zero-padded."""
            out = np.zeros((self.D * ne_loc,) + A.shape[1:], A.dtype)
            out[:NE] = np.asarray(A)
            return out.reshape((self.D, ne_loc) + A.shape[1:])

        dt = hydro.dtype
        self.gather_l = jnp.asarray(lay.gather)
        self.elem_valid = jnp.asarray(lay.elem_valid)
        self.massD_l = jnp.asarray(pad_elem(np.asarray(hydro.massD)), dt)
        self.rw_l = jnp.asarray(pad_elem(np.asarray(hydro.rho0DetJ0w_j)), dt)
        self.J0i_l = jnp.asarray(pad_elem(np.asarray(hydro.Jac0inv_j)), dt)
        self.gamma_l = jnp.asarray(pad_elem(np.asarray(hydro.gamma_j)), dt)
        self.one_l = jnp.asarray(pad_elem(np.asarray(hydro.one_l2)), dt)
        self.owned = jnp.asarray(lay.owned, dt)
        self.ess_l = jnp.asarray(lay.ess)
        self.exch = tuple(jnp.asarray(a) for a in (
            lay.send_next, lay.recv_prev, lay.send_prev, lay.recv_next))
        # local Jacobi diag: assemble locally then halo-sum
        diag_g = np.asarray(hydro.h1_dinv)  # 1/diag on the global dofs
        dl = scatter_global(lay, (1.0 / diag_g)[None])[:, 0, :]
        self.dinv_l = 1.0 / jnp.asarray(np.where(dl == 0.0, 1.0, dl), dt)

        # initial local state
        S0 = hydro.S0
        self.S0 = {
            "x": jnp.asarray(scatter_global(lay, np.asarray(S0["x"])), dt),
            "v": jnp.asarray(scatter_global(lay, np.asarray(S0["v"])), dt),
            "e": jnp.asarray(pad_elem(np.asarray(S0["e"])), dt),
        }
        self._place()
        self._advance = jax.jit(self._make_advance())

    def _place(self):
        sh = NamedSharding(self.mesh, P("dd"))
        put = partial(jax.device_put, device=sh)
        for name in ("gather_l", "elem_valid", "massD_l", "rw_l", "J0i_l",
                     "gamma_l", "one_l", "owned", "ess_l", "dinv_l"):
            setattr(self, name, put(getattr(self, name)))
        self.exch = tuple(put(a) for a in self.exch)
        self.S0 = {k: put(v) for k, v in self.S0.items()}

    # -- per-device step program (runs under shard_map; leading axis 1) --
    def _make_advance(self):
        h = self.h
        d = h.dim
        opt = h.opt
        exch_idx = self.exch

        def step(S, dtv, *consts):
            (gather, evalid, massD, rw, J0i, gamma, one_l2, owned, ess,
             dinv, sn, rp, sp_, rn) = [c[0] for c in consts]
            idx = (sn, rp, sp_, rn)
            nloc = owned.shape[0]
            Sl = {k: v[0] for k, v in S.items()}

            def pdot(u, v):
                return jax.lax.psum(
                    jnp.sum(u * v * owned[None, :], axis=-1), "dd")

            def qupd(Sc):
                x_e = Sc["x"][:, gather].transpose(1, 0, 2)
                v_e = Sc["v"][:, gather].transpose(1, 0, 2)
                sJit, dtm = qop.qupdate(
                    x_e, v_e, Sc["e"], gamma, rw, J0i, h.tables, h.h0,
                    dim=d, h1order=float(opt.order_v), cfl=opt.cfl,
                    use_viscosity=h.use_visc, use_vorticity=h.use_vort,
                    elem_valid=evalid)
                return sJit, jax.lax.pmin(dtm, "dd")

            def assemble(y_e):
                y = mop.e_to_l(y_e, gather, nloc)
                y = halo_exchange_add(y, idx)
                return y

            def mass_apply(u):
                ue = u[:, gather]
                ue = mop.mass_apply_e(ue, massD, h.tables["H1B"], d)
                y = assemble(ue)
                return jnp.where(ess, 0.0, y)

            def solve_velocity(sJit):
                Fone = fop.force_mult(one_l2, sJit, h.tables, dim=d,
                                      ftz_eps2=h.ftz_eps2)
                rhs = -assemble(jnp.swapaxes(Fone, 0, 1))
                rhs = jnp.where(ess, 0.0, rhs)
                res = cg(mass_apply, rhs, opt.cg_tol, opt.cg_max_iter,
                         precond=lambda r: r * dinv[None, :], dot=pdot)
                return res.x, jnp.sum(res.iters)

            def solve_energy(sJit, v):
                v_e = v[:, gather].transpose(1, 0, 2)
                e_rhs = fop.force_mult_transpose(v_e, sJit, h.tables,
                                                 dim=d)

                def apply_A(u):
                    ue = u.reshape(e_rhs.shape)
                    ue = mop.mass_apply_e(ue, massD, h.tables["L2B"], d)
                    return ue.reshape(1, -1)

                def edot(u, v):
                    return jax.lax.psum(jnp.sum(u * v, axis=-1), "dd")

                res = cg(apply_A, e_rhs.reshape(1, -1), opt.cg_tol,
                         opt.cg_max_iter, dot=edot)
                return res.x.reshape(e_rhs.shape), res.iters[0]

            def mult(Sc):
                sJit, dtm = qupd(Sc)
                dv, _ = solve_velocity(sJit)
                de, _ = solve_energy(sJit, Sc["v"])
                return {"x": Sc["v"], "v": dv, "e": de}, dtm

            ax = lambda a, c, b: jax.tree_util.tree_map(
                lambda u, v: u + c * v, a, b)
            k1, m1 = mult(Sl)
            y = ax(Sl, dtv / 2, k1)
            k2, m2 = mult(y)
            y = ax(Sl, dtv / 2, k2)
            k3, m3 = mult(y)
            y = ax(Sl, dtv, k3)
            k4, m4 = mult(y)
            S_new = jax.tree_util.tree_map(
                lambda s0, a1, a2, a3, a4:
                s0 + dtv / 6.0 * (a1 + 2 * a2 + 2 * a3 + a4),
                Sl, k1, k2, k3, k4)
            _, m5 = qupd(S_new)
            dt_est = jnp.minimum(jnp.minimum(m2, m3), jnp.minimum(m4, m5))
            return ({k: v[None] for k, v in S_new.items()}, dt_est)

        consts = (self.gather_l, self.elem_valid, self.massD_l, self.rw_l,
                  self.J0i_l, self.gamma_l, self.one_l, self.owned,
                  self.ess_l, self.dinv_l) + self.exch

        smapped = shard_map(
            step, mesh=self.mesh,
            in_specs=(P("dd"), P()) + tuple(P("dd") for _ in consts),
            out_specs=(P("dd"), P()),
            check_vma=False)

        def advance(S, dtv):
            return smapped(S, dtv, *consts)

        return advance

    def advance(self, S, dtv):
        return self._advance(S, jnp.asarray(dtv, self.h.dtype))

    def dt_estimate(self, S):
        # one qupdate via a full advance with dt=0 would be wasteful; use
        # the conforming hydro for the initial estimate instead
        raise NotImplementedError

    def run(self, t_final, max_steps=-1, verbose=False):
        """Minimal adaptive-dt loop (flagship/benchmark configurations)."""
        S = self.S0
        # initial dt from the conforming operator
        dt = float(self.h.dt_estimate(self.h.S0))
        t = 0.0
        steps = 0
        ti = 1
        last = False
        while not last:
            if t + dt >= t_final:
                dt = t_final - t
                last = True
            if steps == max_steps:
                last = True
            S_old, t_old = S, t
            S_new, dt_est = self.advance(S, dt)
            steps += 1
            dt_est = float(dt_est)
            if dt_est < dt:
                dt *= 0.85
                S, t = S_old, t_old
                if steps < max_steps:
                    last = False
                continue
            S = S_new
            t += dt
            if dt_est > 1.25 * dt:
                dt *= 1.02
            ti += 1
        return S, t, ti - 1

    def e_norm(self, S):
        e = np.asarray(S["e"])
        ev = np.asarray(self.elem_valid)
        return float(np.sqrt((e[ev] ** 2).sum()))
