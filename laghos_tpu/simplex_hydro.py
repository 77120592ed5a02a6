"""Lagrangian hydro on simplex meshes (triangles/tets, full-assembly regime).

The simplex counterpart of hydro.py: no tensor structure, so every
dof<->qpoint map is a full (NQ, nd) matrix — exactly the regime the
reference reaches through MFEM's FA path for simplices (SURVEY M1/M8).
Dimension-generic over 2D triangles and 3D tetrahedra (the reference's
TRIANGLE/TETRAHEDRON geometry-switch entries).  Supports the source-free
problems (ICs from problems.py), RK4, direct per-element energy solve +
coupled velocity CG (the FA solver layout, laghos_solver.cpp:400-439).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import problems
from .fem import simplex as fsx
from .fem import simplex_mesh as fsm
from .fem.quadrature import default_rule_order
from .ops import smallmat
from .solvers.cg import cg


class SimplexHydro:
    def __init__(self, mesh, opt, dtype=jnp.float64):
        self.mesh = mesh
        self.opt = opt
        self.dtype = dtype
        dim = self.dim = mesh.dim
        pb = opt.problem
        self.source, self.use_visc, self.use_vort = problems.problem_flags(
            pb, dim)
        order = default_rule_order(opt.order_v, opt.order_e, opt.order_q)
        if dim == 2:
            h1t = fsx.h1_tri_tables(opt.order_v, order)
            l2t = fsx.l2_tri_tables(opt.order_e, order)
            W = h1t["quad"][-1]
            G = np.stack([h1t["Gx"], h1t["Gy"]], -1)
            sp = fsm.build_tri_h1(mesh, opt.order_v)
        else:
            h1t = fsx.h1_tet_tables(opt.order_v, order)
            l2t = fsx.l2_tet_tables(opt.order_e, order)
            W = h1t["quad"][-1]
            G = np.stack([h1t["Gx"], h1t["Gy"], h1t["Gz"]], -1)
            sp = fsm.build_tet_h1(mesh, opt.order_v)
        self.NQ = W.size
        self.B = jnp.asarray(h1t["B"], dtype)
        self.G = jnp.asarray(G, dtype)
        self.Bl = jnp.asarray(l2t["B"], dtype)
        self.W = jnp.asarray(W, dtype)
        self.nd = h1t["B"].shape[1]
        self.ld = l2t["B"].shape[1]

        self.gather = jnp.asarray(sp["gather"])
        self.ndof = sp["ndof"]
        self.ess = jnp.asarray(sp["ess"])
        NE = self.NE = mesh.num_elems

        x0 = sp["coords"]                          # (ndof, dim)
        v0 = problems.v0(pb, x0, dim).copy()
        v0.T[np.asarray(sp["ess"])] = 0.0

        # L2 ICs at the lattice nodes -> Bernstein
        lat_nodes = l2t["nodes"]                   # (ld, dim) reference
        epos = np.einsum("nc,ecd->end", self._bary_shape(lat_nodes),
                         mesh.verts[mesh.elems])
        rho0n = problems.rho0(pb, epos, dim)
        e0n = problems.e0(pb, epos, dim)
        T = l2t["nodal_to_b"]
        rho0_b = rho0n @ T.T
        e_b = e0n @ T.T

        gamma_e = problems.gamma(
            pb, mesh.verts[mesh.elems].mean(axis=1), dim)

        # t=0 geometry
        x0_l = x0.T
        x0_e = x0_l[:, sp["gather"]].transpose(1, 0, 2)  # (NE, dim, nd)
        J0 = np.einsum("qib,eai->eqab", np.asarray(self.G), x0_e)
        detJ0 = np.linalg.det(J0)
        self.Jac0inv = jnp.asarray(np.linalg.inv(J0), dtype)
        if pb == 1 and opt.blast_energy > 0.0:
            # Sedov point blast: the simplex analog of MFEM's
            # ProjectDeltaCoefficient (laghos.cpp:597-616) — nodal delta
            # at the blast vertex across all elements sharing it,
            # nodal->Bernstein, then scale so the global integral is
            # blast_energy / 2^dim (the main-path convention,
            # hydro.py _sedov_delta_nodal).
            center = np.asarray(opt.blast_position[:dim])
            d2 = np.linalg.norm(epos - center[None, None, :], axis=-1)
            hit = d2 < max(opt.delta_tol, 1e-10)
            if not hit.any():
                raise RuntimeError(
                    "Delta function could not be initialized (no L2 node "
                    "at the blast position)")
            e_b = hit.astype(np.float64) @ T.T
            integral = float(
                (W[None, :] * (e_b @ np.asarray(self.Bl).T)
                 * detJ0).sum())
            e_b *= (opt.blast_energy / 2**dim) / integral

        rho0_q = rho0_b @ np.asarray(self.Bl).T          # (NE, NQ)
        self.rw = jnp.asarray(W[None, :] * rho0_q * detJ0, dtype)
        vol = float((W[None, :] * detJ0).sum())
        # h0: edge scale of the right-corner simplex with the mean element
        # volume, / order (the simplex analog of laghos_solver.cpp:257)
        if dim == 2:
            self.h0 = np.sqrt(2.0 * vol / NE) / opt.order_v
        else:
            self.h0 = (6.0 * vol / NE) ** (1.0 / 3.0) / opt.order_v

        # mass data (pointwise rho0 at qpoints of the initial mesh)
        xq0 = np.einsum("qi,eai->eqa", np.asarray(self.B), x0_e)
        self.massD = jnp.asarray(
            W[None, :] * problems.rho0(pb, xq0, dim) * detJ0, dtype)
        Bn = np.asarray(self.B)
        diag_e = np.einsum("qi,qi,eq->ei", Bn, Bn, np.asarray(self.massD))
        dg = np.zeros(self.ndof)
        np.add.at(dg, sp["gather"].reshape(-1), diag_e.reshape(-1))
        self.h1_dinv = jnp.asarray(1.0 / dg, dtype)
        Bl = np.asarray(self.Bl)
        Me = np.einsum("qi,qj,eq->eij", Bl, Bl, np.asarray(self.massD))
        self.Me_inv = jnp.asarray(np.linalg.inv(Me), dtype)

        self.gamma_j = jnp.asarray(gamma_e, dtype)

        # RT gravity velocity source: B_g = Mv . g with g = (0,-1,0..)
        # is constant in time in the Lagrangian frame (mass matrix
        # constant; laghos_solver.hpp:219-231 / hydro.py source == 2)
        self.rt_rhs = None
        if self.source == 2:
            g = jnp.zeros((dim, self.ndof), dtype).at[1].set(-1.0)
            ue = g[:, self.gather]
            q = jnp.einsum("qi,cei->ceq", self.B, ue) * self.massD[None]
            ye = jnp.einsum("qi,ceq->cei", self.B, q)
            self.rt_rhs = self._assemble(ye)

        self.S0 = {"x": jnp.asarray(x0_l, dtype),
                   "v": jnp.asarray(v0.T, dtype),
                   "e": jnp.asarray(e_b, dtype)}
        self._advance = jax.jit(self._advance_impl)
        self._est = jax.jit(lambda S: self._qupdate(S)[1])

    @staticmethod
    def _bary_shape(nodes):
        """(ld, dim+1) barycentric weights in vertex-column order.

        The H1 numbering (build_{tri,tet}_h1) pairs reference coordinate
        x with vertex 0, y with vertex 1, ..., and 1-sum with the last
        vertex; the L2 node sampling must use the same element map."""
        lam_last = 1.0 - nodes.sum(axis=1)
        return np.concatenate([nodes, lam_last[:, None]], axis=1)

    # ------------------------------------------------------------------
    def _gathered(self, u):
        return u[:, self.gather].transpose(1, 0, 2)    # (NE, dim, nd)

    def _qupdate(self, S):
        x_e = self._gathered(S["x"])
        v_e = self._gathered(S["v"])
        J = jnp.einsum("qib,eai->eqab", self.G, x_e)
        detJ = smallmat.det(J, self.dim)
        Jinv = smallmat.inv(J, self.dim, detJ)
        e_q = S["e"] @ self.Bl.T
        R = self.rw / (detJ * self.W[None, :])
        E = jnp.maximum(0.0, e_q)
        g = self.gamma_j[:, None]
        P = (g - 1.0) * R * E
        cs = jnp.sqrt(g * (g - 1.0) * E)
        eye = jnp.eye(self.dim, dtype=self.dtype)
        stress = -P[..., None, None] * eye
        visc = jnp.zeros_like(R)
        if self.use_visc:
            dV = jnp.einsum("qib,eai->eqab", self.G, v_e)
            sgrad = jnp.einsum("...ab,...bk->...ak", dV, Jinv)
            vort_coeff = 1.0
            if self.use_vort:
                grad_norm = jnp.sqrt(jnp.sum(sgrad * sgrad,
                                             axis=(-2, -1)))
                div_v = jnp.abs(jnp.einsum("...aa->...", sgrad))
                vort_coeff = jnp.where(
                    grad_norm > 0.0,
                    div_v / jnp.maximum(grad_norm, 1e-300), 1.0)
            sym = 0.5 * (sgrad + jnp.swapaxes(sgrad, -2, -1))
            mu, ev = smallmat.sym_eig_smallest(sym, self.dim)
            Jpi = jnp.einsum("...ab,...bk->...ak", J, self.Jac0inv)
            ph = jnp.einsum("...ab,...b->...a", Jpi, ev)
            h = (self.h0 * jnp.linalg.norm(ph, axis=-1)
                 / jnp.linalg.norm(ev, axis=-1))
            visc = 2.0 * R * h * h * jnp.abs(mu)
            eps = 1e-12
            from .ops.qupdate import smooth_step_01

            visc = visc + (0.5 * R * h * cs * vort_coeff
                           * (1.0 - smooth_step_01(mu - 2 * eps, eps)))
            stress = stress + visc[..., None, None] * sym
        sv = smallmat.min_singular_value(J, self.dim)
        h_min = sv / float(self.opt.order_v)
        ih = 1.0 / h_min
        idt = cs * ih + 2.5 * visc * ih * ih / R
        inf = jnp.asarray(jnp.inf, self.dtype)
        dtq = jnp.where(idt > 0.0, self.opt.cfl /
                        jnp.where(idt > 0.0, idt, 1.0), inf)
        dtq = jnp.where(detJ < 0.0, 0.0, dtq)
        sJit = jnp.einsum("...vk,...gk->...gv", stress, Jinv)
        sJit = sJit * (self.W[None, :] * detJ)[..., None, None]
        return sJit, jnp.min(dtq)

    def _assemble(self, y_e):
        """(C, NE, nd) -> (C, ndof) scatter-add."""
        C = y_e.shape[0]
        out = jnp.zeros((C, self.ndof), self.dtype)
        return out.at[:, self.gather.reshape(-1)].add(
            y_e.reshape(C, -1))

    def _mass_apply(self, u):
        ue = u[:, self.gather]                         # (C, NE, nd)
        q = jnp.einsum("qi,cei->ceq", self.B, ue) * self.massD[None]
        ye = jnp.einsum("qi,ceq->cei", self.B, q)
        y = self._assemble(ye)
        return jnp.where(self.ess, 0.0, y)

    def _taylor_source(self, S):
        """(f, psi) Taylor-Green manufactured energy forcing on the
        current mesh (laghos_solver.hpp:207-218; same X,Y-only form as
        the tensor path, hydro.py _taylor_source)."""
        x_e = self._gathered(S["x"])
        J = jnp.einsum("qib,eai->eqab", self.G, x_e)
        detJ = smallmat.det(J, self.dim)
        xq = jnp.einsum("qi,eai->eqa", self.B, x_e)
        X, Y = xq[..., 0], xq[..., 1]
        pi = jnp.pi
        fq = (3.0 / 8.0) * pi * (jnp.cos(3 * pi * X) * jnp.cos(pi * Y)
                                 - jnp.cos(pi * X) * jnp.cos(3 * pi * Y))
        integ = self.W[None, :] * detJ * fq
        return jnp.einsum("qj,eq->ej", self.Bl, integ)

    def _solve_velocity(self, sJit):
        """Coupled velocity-mass CG from the stress qdata (the FA
        solver layout, laghos_solver.cpp:400-439)."""
        # rhs_i[vd] = -sum_q Ghat_g(i,q) sJit[g,vd](q) * 1_q (E=ones)
        one_q = jnp.sum(self.Bl, axis=1)               # (NQ,) sum of basis
        Fq = sJit * one_q[None, :, None, None]
        rhs_e = jnp.einsum("qig,eqgv->vei", self.G, Fq)
        rhs = -self._assemble(rhs_e)
        if self.rt_rhs is not None:
            rhs = rhs + self.rt_rhs
        rhs = jnp.where(self.ess, 0.0, rhs)
        flat = rhs.reshape(1, -1)

        def apply_flat(u):
            return self._mass_apply(
                u.reshape(self.dim, -1)).reshape(1, -1)

        dinv = jnp.broadcast_to(self.h1_dinv[None, :],
                                (self.dim, self.ndof))
        dinv = jnp.where(self.ess, 1.0, dinv).reshape(1, -1)
        res = cg(apply_flat, flat, self.opt.cg_tol, self.opt.cg_max_iter,
                 precond=lambda r: r * dinv)
        return res.x.reshape(self.dim, -1)

    def _solve_energy(self, sJit, v, S):
        """Direct per-element L2 energy solve against velocity v."""
        v_e = v[:, self.gather].transpose(1, 0, 2)
        dVq = jnp.einsum("qig,eai->eqag", self.G, v_e)
        eq = jnp.einsum("eqvg,eqgv->eq", dVq, sJit)
        e_rhs = jnp.einsum("qj,eq->ej", self.Bl, eq)
        if self.source == 1:
            e_rhs = e_rhs + self._taylor_source(S)
        return jnp.einsum("eij,ej->ei", self.Me_inv, e_rhs)

    def _mult(self, S):
        sJit, dtm = self._qupdate(S)
        dv = self._solve_velocity(sJit)
        de = self._solve_energy(sJit, S["v"], S)
        return {"x": S["v"], "v": dv, "e": de}, dtm

    def _advance_impl(self, S, dt):
        if self.opt.ode_solver == 7:
            return self._rk2avg_impl(S, dt)
        ax = lambda a, c, b: jax.tree_util.tree_map(
            lambda u, v: u + c * v, a, b)
        k1, m1 = self._mult(S)
        y = ax(S, dt / 2, k1)
        k2, m2 = self._mult(y)
        y = ax(S, dt / 2, k2)
        k3, m3 = self._mult(y)
        y = ax(S, dt, k3)
        k4, m4 = self._mult(y)
        S_new = jax.tree_util.tree_map(
            lambda s0, a1, a2, a3, a4:
            s0 + dt / 6.0 * (a1 + 2 * a2 + 2 * a3 + a4),
            S, k1, k2, k3, k4)
        _, m5 = self._qupdate(S_new)
        return S_new, jnp.minimum(jnp.minimum(m2, m3),
                                  jnp.minimum(m4, m5))

    def _rk2avg_impl(self, S, dt):
        """Energy-conserving two-stage average scheme (RK2Avg, -s 7;
        laghos_solver.cpp:1447-1487 / hydro.py _rk2avg): the energy
        equation is driven by the stage-averaged velocity V = v0 +
        dt/2 dv, which makes IE+KE drift round-off for source-free
        problems."""
        v0 = S["v"]

        def stage(Scur):
            sJit, dtm = self._qupdate(Scur)
            dv = self._solve_velocity(sJit)
            V = v0 + 0.5 * dt * dv
            de = self._solve_energy(sJit, V, Scur)
            return {"x": V, "v": dv, "e": de}, dtm

        d1, _ = stage(S)
        Smid = jax.tree_util.tree_map(lambda a, b: a + 0.5 * dt * b,
                                      S, d1)
        d2, m2 = stage(Smid)
        S_new = jax.tree_util.tree_map(lambda a, b: a + dt * b, S, d2)
        _, m3 = self._qupdate(S_new)
        return S_new, jnp.minimum(m2, m3)

    def run(self, t_final, max_steps=-1, verbose=False):
        S = self.S0
        t = 0.0
        dt = float(self._est(S))
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
            S_new, dt_est = self._advance(S, jnp.asarray(dt, self.dtype))
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
            if verbose and ti % 10 == 0:
                en = float(jnp.sqrt(jnp.sum(S["e"] ** 2)))
                print(f"step {ti:5d}, t = {t:.4f}, dt = {dt:.6f}, "
                      f"|e| = {en:.10e}")
            ti += 1
        return S, t, ti - 1


# Backwards-compatible name: the 2D-only class this module started as.
TriHydro = SimplexHydro
