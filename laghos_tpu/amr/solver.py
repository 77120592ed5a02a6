"""AMR hydrodynamics operator: conforming solve on a hanging-node forest.

Mirrors the reference AMR variant's semantics (amr/laghos_solver.cpp):
  * full-assembly-style solves (direct per-element energy mass inverse,
    coupled velocity CG) — the variant is FA-only (amr/laghos.cpp:219-227),
  * hard `if (mu < 0)` viscosity switch (amr/laghos_solver.cpp:610), no
    vorticity term,
  * per-element h0 scaling by 2^-depth (amr/laghos_solver.cpp:598-604),
  * per-zone max artificial viscosity as the refinement estimator
    (amr/laghos_solver.cpp:644-647).

State lives in TRUE dofs; the hanging-node interpolation P expands to the
full node set before element gathers, and P^T folds residuals back — the
TPU equivalent of MFEM's conforming prolongation inside CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import basis as fb
from ..fem import quadrature as fq
from ..ops import force as fop
from ..ops import mass as mop
from ..ops import qupdate as qop
from ..ops import smallmat
from ..ops import tensor as top
from ..solvers.cg import cg


class AMRHydro:
    """Sedov-blast hydrodynamics on an adaptive forest (problem 1)."""

    def __init__(self, forest, opt, dtype=jnp.float64,
                 h0_zone_count=None, h0=None, ckpt=None):
        # h0: explicit base length scale.  The reference AMR driver
        # OVERRIDES the mesh-derived h0 with SetH0(0.5 / order_v)
        # (amr/laghos.cpp "double elem_size = 0.5; oper.SetH0(...)"),
        # 0.5 being the base element size of square01_quad / cube01_hex;
        # AMRUpdate never recomputes it.  h0_zone_count keeps the
        # mesh-derived fallback (amr/laghos_solver.cpp:165-187) for
        # forests not driven through the reference CLI semantics.
        self.forest = forest
        self.opt = opt
        self.h0_zone_count = h0_zone_count
        if h0 is not None:
            self._h0 = float(h0)
        self.dtype = dtype
        d = self.dim = forest.dim
        self.nd1 = opt.order_v + 1
        self.l1d = opt.order_e + 1
        self.ld = self.l1d**d
        ir_order = fq.default_rule_order(opt.order_v, opt.order_e,
                                         opt.order_q)
        nq1 = self.nq1 = fq.points_for_order(ir_order)
        self.NQ = nq1**d
        qpts, w1 = fq.gauss_legendre(nq1)
        W = w1
        for _ in range(d - 1):
            W = np.kron(w1, W)
        self.Wnp = W
        h1b = fb.h1_gl_basis(opt.order_v, nq1)
        # AMR uses the DEFAULT (Gauss-Legendre nodal) L2 basis, not
        # Bernstein: MFEM cannot derefine non-nodal bases, so the
        # reference AMR build comments out BasisType::Positive
        # (amr/laghos.cpp:329, amr/README "Limitations").  The reported
        # |e| norm is the dof-vector norm in this nodal basis.
        gln, _ = fq.gauss_legendre(opt.order_e + 1)
        l2B, _ = fb.lagrange_tables(gln, qpts)
        self.l2_nodes1d = gln
        self.tables = {
            "H1B": jnp.asarray(h1b.B, dtype),
            "H1G": jnp.asarray(h1b.G, dtype),
            "L2B": jnp.asarray(l2B, dtype),
            "W": jnp.asarray(W, dtype),
        }

        # physics flags: AMR variant is Sedov-only with hard viscosity
        self.use_visc = True
        self.h1order = float(opt.order_v)

        # distribution hook: parallel.sharding.shard_amr installs a
        # re-placement callback so every AMR rebuild keeps the ctx and
        # state sharded over the device mesh (Rebalance equivalent)
        self._on_rebuild = None
        self.device_mesh = None

        if ckpt is None:
            self.rebuild(initial=True)
        else:
            # resume from a driver checkpoint: the history-dependent
            # pieces are the interpolated initial config x0_T (carried
            # through every AMR transfer), the frozen h0
            # (amr/laghos_solver.cpp:165-187; AMRUpdate never
            # recomputes it), and the current (x, v, e) state
            self.x0_T = np.asarray(ckpt["x0_T"], np.float64)
            self._h0 = float(ckpt["h0"])
            self.rebuild(initial=False)
            self.state = self.pad_state(ckpt["xT"], ckpt["vT"], ckpt["e"])

    # ------------------------------------------------------------------
    def rebuild(self, initial=False):
        self._build_space_arrays()
        if initial:
            sp = self.space
            coords = sp["coords"]
            x0_T = coords[sp["true_ids"]].T                   # (d, nt)
            self.x0_T = x0_T
            self._build_geometry()
            self.state = self.pad_state(x0_T, np.zeros_like(x0_T),
                                        self._initial_energy(coords))
        else:
            self._build_geometry()
        if self._on_rebuild is not None:
            self._on_rebuild()

    @staticmethod
    def _cap(n, quantum=64):
        return max(quantum, -(-n // quantum) * quantum)

    def _build_space_arrays(self):
        opt = self.opt
        sp = self.forest.build_space(opt.order_v)
        self.space = sp
        self.NE = self.forest.num_leaves
        self.nn = sp["nn"]
        self.nt = sp["true_ids"].size

    def _build_geometry(self):
        """Assemble the padded device context (single compile across AMR
        events: every array has capacity-padded static shapes, so the
        jitted advance only retraces when a capacity grows)."""
        d = self.dim
        opt = self.opt
        sp = self.space
        NE, nn, nt = self.NE, self.nn, self.nt
        cap_ne = self._cap(NE)
        cap_nn = self._cap(nn + 1)       # +1 dead node slot
        cap_nt = self._cap(nt + 1)       # +1 dead true slot
        ns = sp["slave_ids"].size
        cap_ns = self._cap(max(ns, 1), 16)
        W = sp["masters"].shape[1] if ns else 1
        dead_node = cap_nn - 1
        dead_true = cap_nt - 1

        gather = np.full((cap_ne, (opt.order_v + 1) ** d), dead_node,
                         dtype=np.int32)
        gather[:NE] = sp["gather"]
        elem_valid = np.zeros(cap_ne, dtype=bool)
        elem_valid[:NE] = True
        true_ids = np.full(cap_nt, dead_node, dtype=np.int64)
        true_ids[:nt] = sp["true_ids"]
        true_valid = np.zeros(cap_nt)
        true_valid[:nt] = 1.0
        slave_ids = np.full(cap_ns, dead_node, dtype=np.int64)
        masters = np.full((cap_ns, W), dead_true, dtype=np.int64)
        weights = np.zeros((cap_ns, W))
        if ns:
            slave_ids[:ns] = sp["slave_ids"]
            # master indices are into the true numbering (unpadded) — valid
            masters[:ns] = sp["masters"]
            weights[:ns] = sp["weights"]
        ess_true = np.zeros((d, cap_nt), dtype=bool)
        ess_true[:, :nt] = sp["ess"][:, sp["true_ids"]]
        ess_nodes = np.zeros((d, cap_nn), dtype=bool)
        ess_nodes[:, :nn] = sp["ess"]

        # t=0 geometry on the (possibly interpolated) initial config
        x0_L = self._p_apply_np(np.asarray(self.x0_T))     # (d, nn)
        x0_pad = np.zeros((d, cap_nn))
        x0_pad[:, :nn] = x0_L
        x0_e = x0_pad[:, gather].transpose(1, 0, 2)
        J0 = np.array(qop.jacobians(
            jnp.asarray(x0_e, self.dtype), self.tables["H1B"],
            self.tables["H1G"], d))
        J0[~elem_valid] = np.eye(d)[None, None]
        detJ0 = np.linalg.det(J0)
        Jac0inv = np.linalg.inv(J0)
        rw = self.Wnp[None, :] * detJ0                     # rho0 = 1
        rw[~elem_valid] = 0.0
        # h0 = (area / zone count)^(1/d) / order, computed ONCE on the
        # initial (vertex-refined) mesh and frozen through all AMR events
        # (amr/laghos_solver.cpp:165-187; AMRUpdate does not recompute it)
        if not hasattr(self, "_h0"):
            vol = float(rw[elem_valid].sum())
            zc = self.h0_zone_count or NE
            self._h0 = (np.sqrt(vol / zc) if d == 2
                        else (vol / zc) ** (1.0 / 3.0)) / opt.order_v
        h0 = self._h0

        Me = np.array(mop.l2_mass_matrices(
            jnp.asarray(rw, self.dtype), self.tables["L2B"], d))
        Me[~elem_valid] = np.eye(self.ld)[None]
        Me_inv = np.linalg.inv(Me)

        depths = np.zeros(cap_ne, dtype=np.int32)
        depths[:NE] = self.forest.depths()

        ctx = {
            "gather": jnp.asarray(gather),
            "elem_valid": jnp.asarray(elem_valid),
            "true_ids": jnp.asarray(true_ids),
            "true_valid": jnp.asarray(true_valid, self.dtype),
            "slave_ids": jnp.asarray(slave_ids),
            "masters": jnp.asarray(masters),
            "weights": jnp.asarray(weights, self.dtype),
            "ess_true": jnp.asarray(ess_true),
            "ess_nodes": jnp.asarray(ess_nodes),
            "rho0DetJ0w": jnp.asarray(rw, self.dtype),
            "Jac0inv": jnp.asarray(Jac0inv, self.dtype),
            "massD": jnp.asarray(rw, self.dtype),
            "Me_inv": jnp.asarray(Me_inv, self.dtype),
            "depths": jnp.asarray(depths),
            "h0": jnp.asarray(h0, self.dtype),
        }
        diag_n = np.array(mop.h1_mass_diag(
            ctx["gather"], cap_nn, ctx["massD"], self.tables["H1B"], d))
        # fold slave diag contributions onto masters (approximate Jacobi)
        diag_t = diag_n[true_ids]
        diag_t[~(true_valid > 0)] = 1.0
        diag_t[diag_t == 0.0] = 1.0
        ctx["h1_dinv"] = jnp.asarray(1.0 / diag_t, self.dtype)
        self.ctx = ctx
        caps = (cap_ne, cap_nn, cap_nt, cap_ns, W)
        self.cap_ne, self.cap_nn, self.cap_nt = cap_ne, cap_nn, cap_nt
        eps = np.finfo(np.float64).eps
        self.ftz_eps2 = eps * eps
        # rebuild the jit wrapper whenever any static capacity changes:
        # the old-capacity executables can never be called again, and
        # keeping every historical specialization alive exhausts host
        # memory on long AMR runs (LLVM 'Cannot allocate memory' during
        # the ~30th retrace)
        if getattr(self, "_jit_caps", None) != caps:
            self._jit_caps = caps
            self._advance_jit = jax.jit(self._advance_impl)
            import gc

            gc.collect()

    def advance(self, S, dt, count_stage1=False):
        return self._advance_jit(S, jnp.asarray(dt, self.dtype),
                                 jnp.asarray(bool(count_stage1)), self.ctx)

    def pad_state(self, xT, vT, e):
        """Pad (d, nt)/(NE, ld) host arrays to capacity device arrays."""
        d = self.dim
        xp = np.zeros((d, self.cap_nt))
        vp = np.zeros((d, self.cap_nt))
        ep = np.zeros((self.cap_ne, self.ld))
        xp[:, :self.nt] = xT
        vp[:, :self.nt] = vT
        ep[:self.NE] = e
        return {"x": jnp.asarray(xp, self.dtype),
                "v": jnp.asarray(vp, self.dtype),
                "e": jnp.asarray(ep, self.dtype)}

    # ------------------------------------------------------------------
    def _initial_energy(self, coords):
        """Delta blast at the origin corner.

        NOTE: unlike main laghos.cpp:601-604 (which passes
        blast_energy / 2^dim to DeltaCoefficient, "due to simulating
        only a portion of the symmetric blast"), the AMR variant passes
        blast_energy UNSCALED (amr/laghos.cpp:417-421, fixed 0.25) — so
        the projected delta integrates to the full 0.25."""
        d = self.dim
        opt = self.opt
        # corner leaf: the one containing the origin
        e = np.zeros((self.NE, self.ld))
        gl_nodes, _ = fq.gauss_legendre(opt.order_e + 1)
        # find leaf with min corner == 0
        order = self.forest.leaf_list()
        corner = None
        for li, (k, idx) in enumerate(order):
            if all(v == 0 for v in idx):
                corner = li
                depth = k
        assert corner is not None
        p = opt.order_e
        vals1 = (1.0 - gl_nodes) ** p
        lat = np.stack([g.reshape(-1, order="F") for g in np.meshgrid(
            *([np.arange(p + 1)] * d), indexing="ij")], axis=1)
        vals = np.ones(self.ld)
        for n in range(self.ld):
            for dd in range(d):
                vals[n] *= vals1[lat[n, dd]]
        # integral of the delta polynomial over the corner leaf
        D = self.forest.max_depth
        size = [self.forest.sizes[k] / self.forest.base_n[k] / (1 << depth)
                for k in range(d)]
        detJ = np.prod(size)
        integral = detJ / (p + 1) ** d
        scale = opt.blast_energy / integral
        # nodal GL basis: the ProjectDelta polynomial values at the nodes
        # ARE the dofs (no change of basis; the AMR build does not use
        # the Positive basis, amr/laghos.cpp:414-427)
        e[corner] = vals * scale
        return e

    # ---------------- jitted compute (ctx = padded device arrays) -------
    def _p_apply(self, ctx, xT):
        """true (C, nt_cap) -> full nodes (C, nn_cap)."""
        C = xT.shape[0]
        nn = ctx["ess_nodes"].shape[-1]
        xL = jnp.zeros((C, nn), self.dtype)
        xL = xL.at[:, ctx["true_ids"]].set(xT)
        sv = jnp.einsum("csw,sw->cs", xT[:, ctx["masters"]],
                        ctx["weights"])
        xL = xL.at[:, ctx["slave_ids"]].set(sv)
        return xL

    def _p_apply_np(self, xT):
        sp = self.space
        C = xT.shape[0]
        xL = np.zeros((C, self.nn))
        xL[:, sp["true_ids"]] = xT
        if sp["slave_ids"].size:
            sv = np.einsum("csw,sw->cs", xT[:, sp["masters"]],
                           sp["weights"])
            xL[:, sp["slave_ids"]] = sv
        return xL

    def _pT_apply(self, ctx, yL):
        yT = yL[:, ctx["true_ids"]]
        # padded true ids point at the dead node -> they accumulate junk;
        # clear via the true-dof validity mask afterwards
        contrib = yL[:, ctx["slave_ids"], None] * ctx["weights"][None]
        yT = yT.at[:, ctx["masters"].reshape(-1)].add(
            contrib.reshape(yL.shape[0], -1))
        return yT * ctx["true_valid"][None, :]

    def _qupdate(self, ctx, S):
        d = self.dim
        xL = self._p_apply(ctx, S["x"])
        vL = self._p_apply(ctx, S["v"])
        x_e = xL[:, ctx["gather"]].transpose(1, 0, 2)
        v_e = vL[:, ctx["gather"]].transpose(1, 0, 2)
        return amr_qupdate(
            x_e, v_e, S["e"], ctx["rho0DetJ0w"], ctx["Jac0inv"],
            self.tables, ctx["h0"], ctx["depths"], dim=d,
            h1order=self.h1order, cfl=self.opt.cfl, gamma=1.4,
            elem_valid=ctx["elem_valid"])

    def _solve_velocity(self, ctx, sJit):
        d = self.dim
        nn = ctx["ess_nodes"].shape[-1]
        one_l2 = jnp.ones(ctx["rho0DetJ0w"].shape[:1] + (self.ld,),
                          self.dtype)
        Fone = fop.force_mult(one_l2, sJit, self.tables, dim=d,
                              ftz_eps2=self.ftz_eps2)
        rhs_L = mop.e_to_l(jnp.swapaxes(Fone, 0, 1), ctx["gather"], nn)
        rhs = -self._pT_apply(ctx, rhs_L)
        rhs = jnp.where(ctx["ess_true"], 0.0, rhs)

        def apply_A(uT):
            uL = self._p_apply(ctx, uT)
            yL = mop.h1_mass_apply(uL, ctx["gather"], nn, ctx["massD"],
                                   self.tables["H1B"], d)
            yT = self._pT_apply(ctx, yL)
            return jnp.where(ctx["ess_true"], 0.0, yT)

        flat = rhs.reshape(1, -1)

        def apply_flat(u):
            return apply_A(u.reshape(d, -1)).reshape(1, -1)

        # plain (unpreconditioned) CG: the AMR variant's FA velocity
        # solve is CGSolver with no preconditioner
        # (amr/laghos_solver.cpp:286-296)
        res = cg(apply_flat, flat, self.opt.cg_tol, self.opt.cg_max_iter)
        return res.x.reshape(d, -1), jnp.sum(res.iters)

    def _solve_energy(self, ctx, sJit, vT):
        d = self.dim
        vL = self._p_apply(ctx, vT)
        v_e = vL[:, ctx["gather"]].transpose(1, 0, 2)
        e_rhs = fop.force_mult_transpose(v_e, sJit, self.tables, dim=d)
        de = jnp.einsum("eij,ej->ei", ctx["Me_inv"], e_rhs)
        return de

    def _mult(self, ctx, S):
        sJit, dtmin, visc_max = self._qupdate(ctx, S)
        dv, h1it = self._solve_velocity(ctx, sJit)
        de = self._solve_energy(ctx, sJit, S["v"])
        return ({"x": S["v"], "v": dv, "e": de}, dtmin, visc_max, h1it)

    def _advance_impl(self, S, dt, count_stage1, ctx):
        """RK step (ode_solver 1/2/3/4/6, amr/laghos.cpp:337-354) + dt
        estimate + per-zone max viscosity estimator.

        count_stage1: the reference's stage-1 qupdate is memoized from
        the previous post-step GetTimeStepEstimate, so its dt estimate
        contributes ONLY when the quad data was invalidated — after a
        rejected step (ResetQuadratureData) or a mesh change (AMRUpdate
        sets quad_data_is_current = false).  Mirrors the main driver's
        count_stage1 handling (laghos.cpp / laghos_solver.cpp:1028)."""
        tm = jax.tree_util.tree_map
        ax = lambda a, c, b: tm(lambda u, v: u + c * v, a, b)
        acc = {"dt": jnp.asarray(jnp.inf, self.dtype),
               "it": jnp.asarray(0)}

        def mult(y, counted=True):
            k, dtm, _, it = self._mult(ctx, y)
            acc["dt"] = jnp.where(counted, jnp.minimum(acc["dt"], dtm),
                                  acc["dt"])
            acc["it"] = acc["it"] + it
            return k

        s = int(self.opt.ode_solver)
        if s == 1:
            k1 = mult(S, count_stage1)
            S_new = ax(S, dt, k1)
        elif s == 2:
            # mfem RK2Solver(0.5) — midpoint
            k1 = mult(S, count_stage1)
            k2 = mult(ax(S, dt / 2, k1))
            S_new = ax(S, dt, k2)
        elif s == 3:
            # RK3 SSP
            k1 = mult(S, count_stage1)
            y = ax(S, dt, k1)
            k2 = mult(y)
            y = tm(lambda s0, yy, kk: 0.75 * s0 + 0.25 * (yy + dt * kk),
                   S, y, k2)
            k3 = mult(y)
            S_new = tm(lambda s0, yy, kk: (s0 + 2.0 * (yy + dt * kk)) / 3.0,
                       S, y, k3)
        elif s == 4:
            k1 = mult(S, count_stage1)
            k2 = mult(ax(S, dt / 2, k1))
            k3 = mult(ax(S, dt / 2, k2))
            k4 = mult(ax(S, dt, k3))
            S_new = tm(
                lambda s0, a1, a2, a3, a4:
                s0 + dt / 6.0 * (a1 + 2 * a2 + 2 * a3 + a4),
                S, k1, k2, k3, k4)
        elif s == 6:
            from ..hydro import _RK6_A, _RK6_B
            ks = []
            for i in range(8):
                y = S
                for j in range(i):
                    if _RK6_A[i][j] != 0.0:
                        y = ax(y, dt * _RK6_A[i][j], ks[j])
                ks.append(mult(y, count_stage1 if i == 0 else True))
            S_new = S
            for j in range(8):
                if _RK6_B[j] != 0.0:
                    S_new = ax(S_new, dt * _RK6_B[j], ks[j])
        else:
            raise ValueError(f"AMR: unsupported ode solver {s}")
        _, dtm_f, v_f = self._qupdate(ctx, S_new)
        dt_est = jnp.minimum(acc["dt"], dtm_f)
        # the estimator is the zone-max viscosity of the LAST qupdate
        # (amr/laghos_solver.cpp:467-468 resets it per call)
        return S_new, dt_est, v_f, acc["it"]

    # ------------------------------------------------------------------
    def apply_amr(self, refine_keys=(), deref_keys=()):
        """Modify the forest and transfer (x, v, e, x0) to the new space.

        Returns True if the mesh changed (the reference's mesh_changed,
        amr/laghos.cpp:633-719)."""
        from .transfer import H1Transfer, L2Transfer, TransferPlan

        old_order = list(self.forest.leaf_list())
        old_gather = np.asarray(self.space["gather"])
        changed = False
        if refine_keys:
            changed |= bool(self.forest.refine(list(refine_keys)))
        if deref_keys and not changed:
            changed |= bool(self.forest.derefine(list(deref_keys)))
        if not changed:
            return False
        new_order = list(self.forest.leaf_list())
        plan = TransferPlan(old_order, new_order, self.dim)

        # old element values of the H1 fields (strip capacity padding)
        old_nt = self.nt
        xT = np.asarray(self.state["x"])[:, :old_nt]
        vT = np.asarray(self.state["v"])[:, :old_nt]
        e_old = np.asarray(self.state["e"])[:len(old_order)]
        x0T = np.asarray(self.x0_T)
        xL = self._p_apply_np(xT)
        vL = self._p_apply_np(vT)
        x0L = self._p_apply_np(x0T)
        xe = np.stack([xL, vL, x0L], 0)[:, :, old_gather]  # (3, d, NEo, nd)
        xe = xe.reshape(3 * self.dim, len(old_order), -1)
        h1t = H1Transfer(self.opt.order_v, self.dim)
        new_evals = h1t.element_values(plan, xe)           # (3d, NEn, nd)
        l2t = L2Transfer(self.opt.order_e, self.dim)
        new_e = l2t.element_values(plan, e_old)

        # rebuild space arrays, then assemble L-vectors from element values
        self._build_space_arrays()
        sp = self.space
        NEn = len(new_order)
        nn = sp["nn"]
        full = np.zeros((3 * self.dim, nn))
        flat_g = sp["gather"].reshape(-1)
        first = np.zeros(nn, dtype=np.int64)
        first[flat_g[::-1]] = np.arange(flat_g.size - 1, -1, -1)
        full[:, :] = new_evals.reshape(3 * self.dim, -1)[:, first]
        d = self.dim
        xT_new = full[0:d][:, sp["true_ids"]]
        vT_new = full[d:2 * d][:, sp["true_ids"]]
        x0T_new = full[2 * d:3 * d][:, sp["true_ids"]]
        # essential velocity BCs on the new space
        vT_new[sp["ess"][:, sp["true_ids"]]] = 0.0
        self.x0_T = x0T_new
        self._build_geometry()
        self.state = self.pad_state(xT_new, vT_new, new_e)
        if self._on_rebuild is not None:
            self._on_rebuild()
        return True

    def compute_density(self, S):
        """rho = rho0 detJ0/detJ projected on L2 (per-zone, current mesh;
        valid elements only)."""
        d = self.dim
        ctx = self.ctx
        xL = np.asarray(self._p_apply(ctx, S["x"]))
        x_e = xL[:, np.asarray(ctx["gather"])[:self.NE]].transpose(1, 0, 2)
        J = np.asarray(qop.jacobians(
            jnp.asarray(x_e, self.dtype), self.tables["H1B"],
            self.tables["H1G"], d))
        detJ = np.linalg.det(J)
        D = self.Wnp[None, :] * detJ
        M = np.asarray(mop.l2_mass_matrices(
            jnp.asarray(D, self.dtype), self.tables["L2B"], d))
        rw = np.asarray(ctx["rho0DetJ0w"])[:self.NE]
        rt = rw.reshape((self.NE,) + (self.nq1,) * d)
        B = np.asarray(self.tables["L2B"])
        out = rt
        for k in range(d):
            ax = out.ndim - 1 - k
            out = np.moveaxis(np.tensordot(out, B, axes=[[ax], [0]]),
                              -1, ax)
        rhs = out.reshape(self.NE, self.ld)
        return np.linalg.solve(M, rhs[..., None])[..., 0]

    def e_norm(self):
        e = np.asarray(self.state["e"])[:self.NE]
        return float(np.sqrt((e ** 2).sum()))

    # ---- GetPerElementMinMax / FindElementsWithVertex equivalents -------
    @staticmethod
    def _gauss_npoints(int_order):
        """MFEM IntRules.Get(SEGMENT, order) point count (intrules.cpp:
        Gauss rules are exact to 2n-1, built with n = order/2 + 1)."""
        return int_order // 2 + 1

    def _eval_at_gauss(self, vals_e, nodes1d, int_order):
        """Evaluate per-element tensor-nodal fields at the Gauss points
        of IntRules order `int_order` — GridFunction::GetValues under
        GetPerElementMinMax (amr/laghos.cpp:826-866).

        vals_e: (..., NE, (len(nodes1d))**d) nodal values (lex order).
        Returns (..., NE, npts**d)."""
        d = self.dim
        n1 = len(nodes1d)
        npts = self._gauss_npoints(int_order)
        pts, _ = fq.gauss_legendre(npts)
        B, _ = fb.lagrange_tables(np.asarray(nodes1d), pts)  # (npts, n1)
        lead = vals_e.shape[:-1]
        out = vals_e.reshape(lead + (n1,) * d)
        for k in range(d):
            ax = out.ndim - 1 - k
            out = np.moveaxis(np.tensordot(out, B, axes=[[ax], [1]]),
                              -1, ax)
        return out.reshape(lead + (npts ** d,))

    def v_min_max(self, S):
        """Per-element (min, max) of |v| at the int points of order
        order_v + 1 — GetPerElementMinMax(v_gf, ...) on a vector gf
        takes the pointwise Euclidean norm (amr/laghos.cpp:846-857)."""
        vL = self._p_apply_np(np.asarray(S["v"])[:, :self.nt])
        v_e = vL[:, np.asarray(self.space["gather"])]      # (d, NE, nd)
        gl = fq.gauss_lobatto(self.opt.order_v + 1)
        vq = self._eval_at_gauss(v_e, gl, self.opt.order_v + 1)
        mag = np.sqrt((vq ** 2).sum(axis=0))               # (NE, npts^d)
        return mag.min(axis=1), mag.max(axis=1)

    def rho_max(self, S):
        """Per-element max of the L2-projected density at the int points
        of order order_e + 1 (ComputeDensity + GetPerElementMinMax,
        amr/laghos.cpp:663-666)."""
        rho = self.compute_density(S)                      # (NE, ld) nodal
        rq = self._eval_at_gauss(rho, self.l2_nodes1d,
                                 self.opt.order_e + 1)
        return rq.max(axis=1)

    def elements_with_vertex(self, S, position, size=1e-10):
        """Leaf indices with a corner vertex within `size` of `position`
        on the CURRENT (deformed) mesh — FindElementsWithVertex
        (amr/laghos.cpp:799-820), used for blast-zone deref protection."""
        d = self.dim
        p = self.opt.order_v
        xL = self._p_apply_np(np.asarray(S["x"])[:, :self.nt])
        gather = np.asarray(self.space["gather"])          # (NE, (p+1)^d)
        rng = np.arange(p + 1)
        grids = np.meshgrid(*([rng] * d), indexing="ij")
        lat = np.stack([g.reshape(-1, order="F") for g in grids], axis=1)
        corner_sel = np.where(np.all((lat == 0) | (lat == p), axis=1))[0]
        xc = xL[:, gather[:, corner_sel]]                  # (d, NE, 2^d)
        pos = np.asarray(position, dtype=np.float64)[:d]
        dist2 = ((xc - pos[:, None, None]) ** 2).sum(axis=0)
        return np.where((dist2 <= size * size).any(axis=1))[0]


def amr_qupdate(x_e, v_e, e_b, rho0DetJ0w, Jac0inv, tables, h0, depths,
                *, dim, h1order, cfl, gamma, elem_valid=None):
    """Sedov qupdate with the AMR variant's hard viscosity switch and
    per-element depth-scaled h0; also returns per-zone max viscosity."""
    d = dim
    NE = x_e.shape[0]
    H1B, H1G, L2B, W = (tables["H1B"], tables["H1G"], tables["L2B"],
                        tables["W"])
    nd1 = H1B.shape[1]
    nq1 = H1B.shape[0]
    NQ = nq1**d
    l1d = L2B.shape[1]

    xt = x_e.reshape((NE, d) + (nd1,) * d)
    vt = v_e.reshape((NE, d) + (nd1,) * d)
    Jt = top.eval_gradient(xt, H1B, H1G, d)
    J = jnp.moveaxis(Jt.reshape(NE, d, NQ, d), 1, 2)
    detJ = smallmat.det(J, d)
    Jinv = smallmat.inv(J, d, detJ)
    et = e_b.reshape((NE,) + (l1d,) * d)
    e_q = top.eval_values(et, L2B, d).reshape(NE, NQ)
    R = rho0DetJ0w / (detJ * W[None, :])
    E = jnp.maximum(0.0, e_q)
    P = (gamma - 1.0) * R * E
    S = jnp.sqrt(gamma * (gamma - 1.0) * E)
    eye = jnp.eye(d, dtype=x_e.dtype)
    stress = -P[..., None, None] * eye

    dVt = top.eval_gradient(vt, H1B, H1G, d)
    dV = jnp.moveaxis(dVt.reshape(NE, d, NQ, d), 1, 2)
    sgrad = jnp.einsum("...ab,...bk->...ak", dV, Jinv)
    sym = 0.5 * (sgrad + jnp.swapaxes(sgrad, -2, -1))
    mu, compr_dir = smallmat.sym_eig_smallest(sym, d)
    Jpi = jnp.einsum("...ab,...bk->...ak", J, Jac0inv)
    ph_dir = jnp.einsum("...ab,...b->...a", Jpi, compr_dir)
    h0_e = h0 / (2.0 ** depths.astype(x_e.dtype))          # (NE,)
    h = (h0_e[:, None] * jnp.linalg.norm(ph_dir, axis=-1)
         / jnp.linalg.norm(compr_dir, axis=-1))
    visc = 2.0 * R * h * h * jnp.abs(mu)
    visc = visc + jnp.where(mu < 0.0, 0.5 * R * h * S, 0.0)  # hard switch
    stress = stress + visc[..., None, None] * sym

    sv = smallmat.min_singular_value(J, d)
    h_min = sv / h1order
    ih = 1.0 / h_min
    idt = S * ih + 2.5 * visc * ih * ih / R
    inf = jnp.asarray(jnp.inf, x_e.dtype)
    dtq = jnp.where(idt > 0.0, cfl / jnp.where(idt > 0.0, idt, 1.0), inf)
    dtq = jnp.where(detJ < 0.0, 0.0, dtq)

    sJit = jnp.einsum("...vk,...gk->...gv", stress, Jinv)
    sJit = sJit * (W[None, :] * detJ)[..., None, None]
    if elem_valid is not None:
        sJit = jnp.where(elem_valid[:, None, None, None], sJit, 0.0)
        dtq = jnp.where(elem_valid[:, None], dtq, inf)
    dt_est = jnp.min(dtq)
    zone_max_visc = jnp.max(jnp.where(
        elem_valid[:, None], visc, 0.0) if elem_valid is not None else visc,
        axis=1)
    return sJit, dt_est, zone_max_visc
