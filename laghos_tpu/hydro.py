"""LagrangianHydroOperator: the semi-discrete Euler RHS, TPU-native.

Re-designs the reference's central operator (laghos_solver.cpp:104-796)
as a set of pure jitted functions over a state pytree
    S = {"x": (dim, nH1), "v": (dim, nH1), "e": (NE, l2d)}
solving, per evaluation (laghos_solver.cpp:308-518):
    dx/dt = v
    Mv dv/dt = - F . 1            (CG on the H1 mass, per component)
    Me de/dt = + F^T . v (+ src)  (CG on the L2 mass)
with the force qdata recomputed by the qupdate kernel.

Everything static (basis tables, gather maps, t=0 mass data) is built once
on host NumPy; the per-step work is a single jitted `advance` containing
the RK stages, the CG loops (lax.while_loop) and the dt estimate.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import problems
from .fem import basis as fb
from .fem import quadrature as fq
from .fem.mesh import Mesh, SEGMENT, SQUARE, CUBE
from .fem.space import L2Space, build_h1_space
from .ops import force as fop
from .ops import mass as mop
from .ops import structured
from .ops import qupdate as qop
from .ops import tensor as top
from .solvers.cg import cg


@dataclasses.dataclass
class Options:
    """Run configuration mirroring the reference CLI (laghos.cpp:181-278)."""

    problem: int = 1
    order_v: int = 2          # -ok
    order_e: int = 1          # -ot
    order_q: int = -1         # -oq
    cfl: float = 0.5
    cg_tol: float = 1e-8      # -cgt
    cg_max_iter: int = 300    # -cgm
    ftz_tol: float = 0.0      # -ftz: parsed + recorded but numerically
                              # DEAD, faithfully mirroring the reference
                              # (laghos.cpp:233 parses it; grep shows no
                              # use beyond ctor storage + adiak record —
                              # the PA force kernels flush at a
                              # hardcoded eps^2, laghos_assembly.cpp:278,
                              # matched by Hydro.ftz_eps2 below)
    p_assembly: bool = True   # -pa / -fa
    fa_assembled: bool = True  # -fa velocity CG through the globally
                               # assembled sparse mass matrix (the
                               # reference's hypre-matrix solve,
                               # laghos_solver.cpp:413-439); False keeps
                               # the mathematically identical PA matvec
    impose_visc: bool = False
    blast_energy: float = 1.0  # -E0
    delta_tol: float = 1e-12   # -dtol
    ode_solver: int = 4        # -s
    blast_position: tuple = (0.0, 0.0, 0.0)
    use_pallas: bool = False   # fused Pallas physics kernel (3D, f32)
    gather_assembly: bool = True  # incidence-gather assembly (TPU-friendly
                                  # dual of scatter-add; same sums, element
                                  # order per dof)
    structured_el: bool = True    # parity-decomposed E<->L transforms on
                                  # Cartesian meshes (ops/structured.py);
                                  # auto-falls back when not applicable
    dense_ops: bool = False       # dense (NQ, nd) dof->qpoint operators
                                  # instead of sum-factorized passes;
                                  # measured neutral at Q2, -5% at Q4 on
                                  # v5e, kept as an option
    ozaki: bool = False           # f64 production mode for TPU: run the
                                  # hot contractions (CG mass applies,
                                  # force pair, qupdate interpolation) as
                                  # int8-MXU integer-slice matmuls
                                  # (ops/omm.py) — f64-accurate results
                                  # without the VPU f64-emulation tax.
                                  # On raster meshes the contractions
                                  # run as whole-lattice banded int8
                                  # chains (ops/lattice_oz.py).
                                  # 3D + PA + f64 only.
    df64_qphys: str = "auto"      # (ozaki mode) run the pointwise
                                  # qupdate physics chain as a fused
                                  # double-float (two-f32) Pallas VPU
                                  # kernel (ops/pallas_df64.py) instead
                                  # of XLA's emulated-f64 ops, which
                                  # round-trip HBM at every fusion
                                  # boundary (~30 ms vs ~3 ms roofline
                                  # at the ns2 q-lattice).  Accuracy is
                                  # the same ~2^-48 double-float class
                                  # as XLA's own f64-on-TPU emulation.
                                  # "auto" = on for TPU backends, off on
                                  # CPU (real f64 ALUs); "on" forces it
                                  # (interpret-mode on CPU, for tests);
                                  # "off" disables.
    ozaki_slices: int = 8         # int8 slices for the dynamic-side
                                  # Ozaki splits: 8 = full-f64 (~2^-56
                                  # truncation), 7 = ~2^-49 (at the
                                  # double-float emulation noise floor,
                                  # still conserving energy to <1e-12)
    ozaki_rhs_slices: int = 0     # dynamic slice count of the FORCE
                                  # rhs chains (F.1 / grad(v) / L2
                                  # transpose) — the pair whose
                                  # adjointness total-energy
                                  # conservation rides on.  0 = the
                                  # build's static count
                                  # (ozaki_slices).  7 puts every
                                  # per-stage truncation at ~2^-49 —
                                  # the TPU double-float emulation
                                  # noise floor itself — for 28/36 of
                                  # the MXU level-dots per contraction.
    precond: str = "auto"         # velocity-mass CG preconditioner:
                                  # "auto" = "kron" on raster lattices
                                  # (falls back to jacobi elsewhere);
                                  # "jacobi" = PA diagonal (reference
                                  # parity, laghos_solver.cpp:266-270);
                                  # "kron" = per-axis Kronecker inverse
                                  # of the lattice mass factors — EXACT
                                  # M^-1 whenever rho0*detJ0 separates
                                  # per axis (Sedov: constant rho0,
                                  # affine raster mesh), so CG converges
                                  # in 1-3 iterations instead of ~22
                                  # (ops/lattice.py kron_mass_factors);
                                  # "schwarz" = element-block additive
                                  # Schwarz (symmetrized by 1/sqrt(mult)
                                  # counting weights) — measured MORE
                                  # iterations than jacobi (GLL mass is
                                  # already near-diagonal); kept as an
                                  # option, not recommended.
    lattice_ops: bool = True      # whole-lattice banded-matmul mass
                                  # apply on raster Cartesian meshes
                                  # (ops/lattice.py): the CG operator
                                  # becomes 6 dense dot_generals + one
                                  # multiply — no gather/scatter/E-form.
                                  # ~10x the FLOPs of sum-factorization
                                  # but pure MXU work; auto-falls back
                                  # off raster meshes.
    cg_ir: bool = True            # (ozaki-lattice mode) solve the
                                  # velocity mass system by mixed-
                                  # precision iterative refinement:
                                  # inner f32 whole-lattice CG sweeps
                                  # with outer f64-accurate (Ozaki)
                                  # residual corrections, stopping on
                                  # the SAME f64 criterion a plain f64
                                  # CG uses (Carson-Higham IR; the
                                  # classic way dense f64 solves ride
                                  # low-precision hardware).  ~8x the
                                  # all-Ozaki CG at equal solution
                                  # accuracy; disable for an all-f64-
                                  # accurate CG parity mode.
    cg_ir_inner_mxu: str = "bfloat16"  # matmul precision of the inner
                                  # f32 sweeps ("bfloat16" = 1 MXU pass;
                                  # safe: the outer f64 residual check
                                  # absorbs inner operator error)
    cg_ir_inner_tol: float = 1e-5  # relative tolerance of the inner f32
                                  # sweeps in cg_ir mode
    cg_ir_inc: bool = True        # track the outer residual
                                  # incrementally (r <- r - A dx) at a
                                  # reduced slice count after the first
                                  # outer; off = every outer recomputes
                                  # r = b - A x at full s_res slices
    cg_warm_start: bool = False   # warm-start the stage-k mass solves
                                  # from the stage-(k-1) accelerations
                                  # (same convergence target as a cold
                                  # solve, referenced to |b|).  The
                                  # reference always cold-starts
                                  # (iterative_mode=false,
                                  # laghos_solver.cpp:278-283), so
                                  # iteration counts are non-parity;
                                  # solutions agree to cg_tol.


def _l2_node_coords(mesh: Mesh, pts_per_dim: np.ndarray) -> np.ndarray:
    """Physical coords of tensor-lattice points `pts_per_dim` (n,) in [0,1]
    inside each (multi)linear element: (NE, n^dim, dim)."""
    d = mesh.dim
    corners = mesh.verts[mesh.corners_lattice()]  # (NE, 2^d, dim)
    n = pts_per_dim.size
    ncor = 2**d
    nd = n**d
    # lattice multi-index, x fastest
    rng = np.arange(n)
    grids = np.meshgrid(*([rng] * d), indexing="ij")
    lat = np.stack([g.reshape(-1, order="F") for g in grids], axis=1)
    w = np.ones((nd, ncor))
    for dd in range(d):
        t = pts_per_dim[lat[:, dd]][:, None]
        bit = (np.arange(ncor) >> dd) & 1
        w *= np.where(bit[None, :] == 0, 1.0 - t, t)
    return np.einsum("nc,ecd->end", w, corners)


def segment_loop(qupd, step, guard, dtype, S, t, dt, ti, steps, sj,
                 count_stage1, t_final, max_steps, vis_steps, chk):
    """Adaptive-dt control flow of laghos.cpp:741-790 (truncation,
    rejection with 0.85 backoff, 1.02 growth, the reference's exact
    last_step/rejection quirks) as a lax.while_loop, parameterized over
    the operator closures so BOTH the conforming Hydro and the
    distributed wrappers (slab/pencil/chunk) run it — under shard_map
    every control scalar is replicated (psum/pmin-reduced), so all
    devices take identical branches.

      qupd(S)                 -> (sJit, dt_min)
      step(S, dt_eff, sJit1)  -> (S_new, dt_acc, (h1_iters, l2_iters))
      guard(S_new, dt_est)    -> dt_est (0 on non-finite state)

    The body is a FIXED POINT once done/crashed/paused: under jax.vmap
    (batch.sweep's parameter sweeps) the batched while_loop keeps
    executing the body for every member until the LAST one stops, so
    finished members must pass through unchanged.  (In unbatched use
    the cond already prevents this; the selects are free.)
    """
    eps = np.finfo(np.float64).eps

    def attempt(carry):
        stopped = carry[7] | carry[8] | carry[11]
        new = _attempt_body(carry)
        # scalar `stopped` broadcasts against every carry leaf
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, a, b), carry, new)

    def _attempt_body(carry):
        (S, t, dt, ti, steps, sj, cs1, done, crashed, h1a, l2a,
         pause) = carry
        last = jnp.logical_or(t + dt >= t_final, steps == max_steps)
        dt_eff = jnp.where(t + dt >= t_final, t_final - t, dt)

        def fresh(_):
            return qupd(S)

        def memo(_):
            return sj, jnp.asarray(jnp.inf, dtype)

        sJ1, dtm1 = jax.lax.cond(cs1, fresh, memo, operand=None)
        S_new, dtacc, (h1it, l2it) = step(S, dt_eff, sJ1)
        # count_stage1 semantics: dtm1 is inf when memoized
        dtacc = jnp.minimum(dtacc, dtm1)
        sj_new, dt_final_q = qupd(S_new)
        dt_est = guard(S_new, jnp.minimum(dtacc, dt_final_q))
        steps = steps + 1
        reject = dt_est < dt_eff
        dt_rej = dt_eff * 0.85
        crashed = jnp.logical_or(crashed,
                                 jnp.logical_and(reject, dt_rej < eps))
        # reference last_step quirk on rejection (laghos.cpp:775)
        last_rej = jnp.logical_and(last,
                                   jnp.logical_not(steps < max_steps))
        grow = dt_est > 1.25 * dt_eff
        dt_acc = jnp.where(grow, dt_eff * 1.02, dt_eff)
        sel = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda u, v: jnp.where(reject, u, v), a, b)
        S = sel(S, S_new)
        sj = sel(sj, sj_new)
        t = jnp.where(reject, t, t + dt_eff)
        dt = jnp.where(reject, dt_rej, dt_acc)
        cs1 = reject
        h1a = h1a + jnp.where(reject, 0, h1it)
        l2a = l2a + jnp.where(reject, 0, l2it)
        done = jnp.where(reject, last_rej, last)
        at_vis = jnp.logical_or(ti % vis_steps == 0,
                                jnp.any(chk == ti))
        pause = jnp.logical_and(jnp.logical_not(reject), at_vis)
        ti = jnp.where(reject, ti, ti + 1)
        return (S, t, dt, ti, steps, sj, cs1, done, crashed, h1a,
                l2a, pause)

    def cond(carry):
        done, crashed, pause = carry[7], carry[8], carry[11]
        return jnp.logical_not(done | crashed | pause)

    f = jnp.bool_(False)
    carry = (S, t, dt, ti, steps, sj, count_stage1, f, f,
             jnp.asarray(0), jnp.asarray(0), f)
    return jax.lax.while_loop(cond, attempt, carry)


class Hydro:
    """Holds all static data + jitted step/estimate functions."""

    def __init__(self, mesh: Mesh, opt: Options, dtype=jnp.float64):
        if opt.structured_el:
            m2 = structured.reorder_mesh_elements_to_raster(mesh)
            if m2 is not None:
                mesh = m2
        self.mesh = mesh
        self.opt = opt
        self.dtype = dtype
        d = self.dim = mesh.dim
        NE = self.NE = mesh.num_elems
        pb = opt.problem

        self.source, self.use_visc, self.use_vort = problems.problem_flags(
            pb, d)
        if opt.impose_visc:
            self.use_visc = True
        # 1D has no PA in the reference (laghos.cpp:455-462)
        self.p_assembly = opt.p_assembly and d > 1

        # --- spaces and tables -------------------------------------------
        self.h1 = build_h1_space(mesh, opt.order_v)
        self.l2 = L2Space(mesh, opt.order_e)
        ir_order = fq.default_rule_order(opt.order_v, opt.order_e,
                                         opt.order_q)
        nq1 = self.nq1 = fq.points_for_order(ir_order)
        self.NQ = nq1**d
        qpts, w1 = fq.gauss_legendre(nq1)
        W = w1
        for _ in range(d - 1):
            W = np.kron(w1, W)  # x fastest on the flat q index
        h1b = fb.h1_gl_basis(opt.order_v, nq1)
        l2b = fb.l2_bernstein_basis(opt.order_e, nq1)
        self.tables = {
            "H1B": jnp.asarray(h1b.B, dtype),
            "H1G": jnp.asarray(h1b.G, dtype),
            "L2B": jnp.asarray(l2b.B, dtype),
            "W": jnp.asarray(W, dtype),
        }
        if opt.dense_ops:
            h1bd, h1gd = top.dense_ops(h1b.B, h1b.G, d)
            l2bd, _ = top.dense_ops(l2b.B, np.zeros_like(l2b.B), d)
            self.tables["H1Bd"] = jnp.asarray(h1bd, dtype)
            self.tables["H1Gd"] = tuple(jnp.asarray(g, dtype) for g in h1gd)
            self.tables["L2Bd"] = jnp.asarray(l2bd, dtype)
        self.oz = None
        if opt.ozaki:
            if d != 3 or dtype != jnp.float64 or not self.p_assembly:
                raise ValueError(
                    "ozaki mode covers the 3D f64 partial-assembly path")
            from .ops import omm
            h1bd, h1gd = top.dense_ops(h1b.B, h1b.G, d)
            l2bd, _ = top.dense_ops(l2b.B, np.zeros_like(l2b.B), d)
            gcat = np.concatenate(list(h1gd), axis=0)       # (3NQ, nd)
            self.oz = {
                "h1": (omm.split_static(h1bd.T), omm.split_static(h1bd)),
                "l2": (omm.split_static(l2bd.T), omm.split_static(l2bd)),
                "force": (omm.split_static(l2bd.T), omm.split_static(gcat)),
                "forceT": (omm.split_static(gcat.T),
                           omm.split_static(l2bd)),
                "qup": (omm.split_static(gcat.T),
                        omm.split_static(l2bd.T)),
            }
        self._sm = (structured.detect_structure(mesh, self.h1.gather,
                                                opt.order_v)
                    if opt.structured_el else None)
        if self._sm is not None:
            # relabel dofs to the raster lattice so the struct
            # transforms' permutation is the identity (saves ~1.7 ms per
            # gather direction at 275k dofs)
            self._sm = structured.renumber_space_to_raster(self.h1,
                                                           self._sm)
        self.gather = jnp.asarray(self.h1.gather)
        self.ndof = self.h1.ndof
        if opt.gather_assembly and self._sm is None:
            inc, msk = mop.build_incidence(self.h1.gather, self.ndof)
            self._inc = jnp.asarray(inc)
            self._incmask = jnp.asarray(msk, dtype)
        else:
            self._inc = None
        self.nd1 = opt.order_v + 1
        self.l1d = opt.order_e + 1
        self.ld = self.l1d**d

        # --- initial state ------------------------------------------------
        x0 = self.h1.node_coords                       # (ndof, d)
        v0 = problems.v0(pb, x0, d)                    # (ndof, d)
        self.ess_mask = np.stack(
            [self.h1.ess_mask(c) for c in range(d)])   # (d, ndof)
        v0 = v0.copy()
        v0.T[self.ess_mask] = 0.0

        # --- t=0 geometry ------------------------------------------------
        x0_l = x0.T                                    # (d, ndof)
        x0_e = x0_l[:, self.h1.gather].transpose(1, 0, 2)  # (NE,d,nd)
        J0 = np.asarray(qop.jacobians(jnp.asarray(x0_e, dtype),
                                      self.tables["H1B"],
                                      self.tables["H1G"], d))
        detJ0 = np.linalg.det(J0)                      # (NE, NQ)
        self.Jac0inv = np.linalg.inv(J0)               # (NE, NQ, d, d)

        # L2 fields: interpolate at Gauss-Legendre nodal points, convert to
        # Bernstein (laghos.cpp:589-624)
        gl_nodes, _ = fq.gauss_legendre(opt.order_e + 1)
        l2_nodes = _l2_node_coords(mesh, gl_nodes)     # (NE, ld, d)
        rho0_nodal = problems.rho0(pb, l2_nodes, d)    # (NE, ld)
        T1 = fb.nodal_to_bernstein(opt.order_e)
        rho0_b = self._nodal_to_bernstein_nd(rho0_nodal, T1)
        if pb == 1:
            e_nodal = self._sedov_delta_nodal(gl_nodes, detJ0)
        else:
            e_nodal = problems.e0(pb, l2_nodes, d)
        e_b = self._nodal_to_bernstein_nd(e_nodal, T1)

        centers = _l2_node_coords(mesh, np.array([0.5]))[:, 0, :]
        gamma_e = problems.gamma(pb, centers, d)       # (NE,)
        # rho0 at qpoints from the *projected* gf (laghos_solver.cpp:1186)
        L2Bq = np.asarray(self.tables["L2B"])
        rho0_q = self._l2_eval_np(rho0_b, L2Bq)        # (NE, NQ)
        self.rho0DetJ0w = W[None, :] * rho0_q * detJ0

        vol = float((W[None, :] * detJ0).sum())
        geom = {1: SEGMENT, 2: SQUARE, 3: CUBE}[d]
        ne_glob = NE
        if geom == SEGMENT:
            h0 = vol / ne_glob
        elif geom == SQUARE:
            h0 = np.sqrt(vol / ne_glob)
        else:
            h0 = (vol / ne_glob) ** (1.0 / 3.0)
        self.h0 = h0 / opt.order_v                     # laghos_solver.cpp:262

        # --- mass data (pointwise rho0 coefficient, laghos_solver.cpp:178) -
        xq0 = self._h1_eval_np(x0_e, np.asarray(self.tables["H1B"]))
        rho0_pw = problems.rho0(pb, xq0, d)            # (NE, NQ)
        self.massD = jnp.asarray(W[None, :] * rho0_pw * detJ0, dtype)
        diag = mop.h1_mass_diag(self.gather, self.ndof, self.massD,
                                self.tables["H1B"], d)
        self.h1_dinv = 1.0 / diag
        self._schwarz = None
        if opt.precond == "schwarz":
            Me_h1 = mop.element_mass_matrices(
                np.asarray(self.massD), np.asarray(h1b.B), d)
            counts = np.zeros(self.ndof)
            np.add.at(counts, self.h1.gather.reshape(-1), 1.0)
            self._schwarz = (
                jnp.asarray(np.linalg.inv(Me_h1), dtype),
                jnp.asarray(1.0 / np.sqrt(counts), dtype))
        elif opt.precond not in ("jacobi", "auto", "kron"):
            raise ValueError(f"unknown precond {opt.precond!r}")
        Me = np.asarray(
            mop.l2_mass_matrices(self.massD, self.tables["L2B"], d))
        self.Me_inv = jnp.asarray(np.linalg.inv(Me), dtype)  # (NE, ld, ld)

        # RT gravity RHS is constant in time: B_g = Mv . g, g = (0,-1,0)
        if self.source == 2:
            g = np.zeros((d, self.ndof))
            g[1, :] = -1.0
            self.rt_rhs = mop.h1_mass_apply(
                jnp.asarray(g, dtype), self.gather, self.ndof, self.massD,
                self.tables["H1B"], d)
        else:
            self.rt_rhs = None

        self.ess_mask_j = jnp.asarray(self.ess_mask)
        # full-assembly velocity mass: assembled ONCE into a global
        # sparse matrix (time-constant quadrature data rho0*detJ0, like
        # the reference's one-time hypre mass assembly,
        # laghos_solver.cpp:201-221) and applied in the -fa velocity CG
        # (laghos_solver.cpp:413-439) — the production -fa solve goes
        # through the assembled operator, not the PA matvec.
        self._h1_bcoo = None
        if not self.p_assembly and opt.fa_assembled:
            from .ops import assemble as aop

            Mel = aop.h1_mass_element_matrices(self.massD,
                                               self.tables["H1B"], d)
            self._h1_bcoo = aop.to_bcoo(Mel, self.gather, self.ndof)
        self.gamma_j = jnp.asarray(gamma_e, dtype)
        self.rho0DetJ0w_j = jnp.asarray(self.rho0DetJ0w, dtype)
        self.Jac0inv_j = jnp.asarray(self.Jac0inv, dtype)
        # scalarized 3D q-data path: Jac0inv as 9 separate (NE, NQ)
        # component arrays (see ops/qupdate.py::qupdate3d)
        self._sJ9 = d == 3
        self.Jac0inv9_j = tuple(
            jnp.asarray(self.Jac0inv[..., a, b], dtype)
            for a in range(3) for b in range(3)) if self._sJ9 else None
        self.one_l2 = jnp.ones((NE, self.ld), dtype)

        # whole-lattice banded-matmul operators (raster meshes only).
        # In ozaki mode the same banded chains run as f64-accurate
        # int8-MXU slice matmuls (ops/lattice_oz.py) — the fusion that
        # closes the f64-vs-f32 FOM gap.
        self._lat = None
        self._lat_dims = None
        self._lat_oz = None
        self._lat32 = None
        if opt.lattice_ops and self.p_assembly and d > 1:
            from .ops import lattice as lop

            built = lop.build_lattice_ops(self)
            if built is not None:
                self._lat_dims = built.pop("lat_dims")
                self._lat = built
                if opt.ozaki:
                    from .ops import lattice_oz as lzo

                    l2bd_, _ = top.dense_ops(l2b.B,
                                             np.zeros_like(l2b.B), d)
                    self._lat_oz = lzo.build_lattice_oz(
                        h1b.B, h1b.G, l2bd_,
                        tuple(reversed(self._sm.dims)),
                        n_slices=opt.ozaki_slices)
                    # f32 shadow of the banded mass operator for the
                    # inner sweeps of the mixed-precision IR velocity
                    # solve (opt.cg_ir)
                    self._lat32 = {
                        "Ts": tuple(T.astype(jnp.float32)
                                    for T in self._lat["Ts"]),
                        "Dq": self._lat["Dq"].astype(jnp.float32),
                    }
                    if "kron" in self._lat:
                        self._lat32["kron"] = tuple(
                            Mk.astype(jnp.float32)
                            for Mk in self._lat["kron"])
        # full lattice pipeline (qupdate gradients + force pair as
        # banded matmuls) — 2D/3D, non-pallas, non-dense variants
        self._edims = None if self._lat is None else self._sm.dims
        self._latq = (self._lat is not None and d in (2, 3)
                      and "Tg" in self._lat and not opt.dense_ops)
        eps = np.finfo(np.float64).eps
        self.ftz_eps2 = eps * eps

        self.S0 = {
            "x": jnp.asarray(x0_l, dtype),
            "v": jnp.asarray(v0.T, dtype),
            "e": jnp.asarray(e_b, dtype),
        }

        # compiled entry points (built lazily, keyed by static flags).
        # Every jit takes the large per-mesh arrays as ARGUMENTS (via
        # _ctx/_bind_ctx) rather than closure constants: embedded
        # multi-MB constants bloat the lowered module ~linearly with NE
        # and broke remote compilation at rs5 (HTTP 413) — and XLA
        # handles parameters better than giant literals anyway.
        self._advance_cache = {}
        self._estimate = self._ctx_jit(self._dt_estimate_impl)
        self._energies = self._ctx_jit(self._energies_impl)
        # phase-jitted pieces for the FOM-instrumented path
        self._jq = self._ctx_jit(self._qupdate)
        self._jforce1 = self._ctx_jit(self._force_rhs_raw)
        self._jprep_v = self._ctx_jit(self._prep_velocity_rhs)
        self._jcg_v = self._ctx_jit(self._cg_velocity)
        self._jfT = self._ctx_jit(self._force_transpose)
        self._jsrc = self._ctx_jit(self._taylor_source)
        self._jcg_e = self._ctx_jit(self._cg_energy)

    # -------------------------------------------------- setup helpers ----
    def _nodal_to_bernstein_nd(self, f_nodal: np.ndarray, T1: np.ndarray):
        d = self.dim
        n = self.l1d
        out = f_nodal.reshape((self.NE,) + (n,) * d)
        for k in range(d):
            ax = out.ndim - 1 - k
            out = np.moveaxis(
                np.tensordot(out, T1, axes=[[ax], [1]]), -1, ax)
        return out.reshape(self.NE, self.ld)

    def _l2_eval_np(self, u, B):
        d = self.dim
        ut = u.reshape((self.NE,) + (self.l1d,) * d)
        for k in range(d):
            ax = ut.ndim - 1 - k
            ut = np.moveaxis(np.tensordot(ut, B, axes=[[ax], [1]]), -1, ax)
        return ut.reshape(self.NE, -1)

    def _h1_eval_np(self, x_e, B):
        """positions at qpoints: (NE, NQ, dim)."""
        d = self.dim
        ut = x_e.reshape((self.NE, d) + (self.nd1,) * d)
        for k in range(d):
            ax = ut.ndim - 1 - k
            ut = np.moveaxis(np.tensordot(ut, B, axes=[[ax], [1]]), -1, ax)
        return np.moveaxis(ut.reshape(self.NE, d, -1), 1, 2)

    def _sedov_delta_nodal(self, gl_nodes: np.ndarray,
                           detJ0: np.ndarray) -> np.ndarray:
        """Point-blast energy: MFEM's delta projection + global rescale.

        Replicates GridFunction::ProjectDeltaCoefficient as invoked at
        laghos.cpp:597-616: find the mesh vertex nearest the blast point,
        set dofs of adjacent elements to the ProjectDelta polynomial
        ((1-t)^p or t^p per axis), then scale so the global integral is
        blast_energy / 2^dim.
        """
        mesh, opt, d = self.mesh, self.opt, self.dim
        center = np.asarray(opt.blast_position[:d])
        dist = np.linalg.norm(mesh.verts - center[None, :], axis=1)
        v_idx = int(np.argmin(dist))
        out = np.zeros((self.NE, self.ld))
        if dist[v_idx] >= opt.delta_tol:
            raise RuntimeError("Delta function could not be initialized "
                               "(no mesh vertex at the blast position)")
        p = opt.order_e
        # nodal L2 basis (Lagrange at GL points) at the quadrature points,
        # for the element mass matrices of the integral normalization
        qpts, w1 = fq.gauss_legendre(self.nq1)
        Bn, _ = fb.lagrange_tables(gl_nodes, qpts)
        full = Bn
        for _ in range(d - 1):
            full = np.kron(Bn, full)
        W = w1
        for _ in range(d - 1):
            W = np.kron(w1, W)

        lat = np.stack(
            [g.reshape(-1, order="F") for g in np.meshgrid(
                *([np.arange(p + 1)] * d), indexing="ij")], axis=1)

        corners = mesh.corners_lattice()
        integral = 0.0
        for e in range(self.NE):
            hit = np.where(corners[e] == v_idx)[0]
            if hit.size == 0:
                continue
            # ProjectDelta polynomial for the local corner: per axis
            # (1-t)^p or t^p depending on the corner bit (MFEM
            # L2_*Element::ProjectDelta with Poly_1D::CalcDelta = t^p)
            corner_bits = [(int(hit[0]) >> dd) & 1 for dd in range(d)]
            vals1 = np.empty((d, p + 1))
            for dd in range(d):
                vals1[dd] = (gl_nodes**p if corner_bits[dd] == 1
                             else (1.0 - gl_nodes) ** p)
            vals = np.ones(self.ld)
            for n_loc in range(self.ld):
                for dd in range(d):
                    vals[n_loc] *= vals1[dd][lat[n_loc, dd]]
            out[e] = vals
            # element mass (nodal basis, no coefficient, initial mesh)
            Dq = W * detJ0[e]
            Me = np.einsum("qi,qj,q->ij", full, full, Dq)
            integral += (Me @ vals).sum()
        scale = (opt.blast_energy / 2**d) / integral
        out *= scale
        return out

    # -------------------------------------------------- jitted pieces ----
    def _qupdate(self, S):
        d = self.dim
        if self._latq and d == 2:
            from .ops import lattice as lop

            return lop.qupdate2d_lattice(
                S["x"], S["v"], S["e"], self._lat, self._lat_dims,
                self._edims, self.tables,
                h1order=float(self.opt.order_v), cfl=self.opt.cfl,
                use_viscosity=self.use_visc,
                use_vorticity=self.use_vort)
        if self._latq:
            # whole-lattice qupdate: banded-matmul gradients straight
            # from the raster L-vectors (no gather, no E-form)
            from .ops import lattice as lop

            from .ops import pallas_df64 as pdf

            return lop.qupdate3d_lattice(
                S["x"], S["v"], S["e"], self._lat, self._lat_dims,
                self._edims, self.tables,
                h1order=float(self.opt.order_v), cfl=self.opt.cfl,
                use_viscosity=self.use_visc,
                use_vorticity=self.use_vort,
                pallas=(self.opt.use_pallas and self.use_visc
                        and self.dtype == jnp.float32),
                h0=self.h0, oz=self._lat_oz,
                df64=(pdf.df64_mode(self.opt.df64_qphys)
                      if self._lat_oz is not None else None))
        x_e = self._gather_e(S["x"])
        v_e = self._gather_e(S["v"])
        if self._sJ9:
            # scalarized 3D path: q-data flows as 9 component arrays so
            # no (NE, NQ, 3, 3) array (57x HBM tile-padding waste) is
            # ever materialized; optionally fused as a Pallas kernel
            return qop.qupdate3d(
                x_e, v_e, S["e"], self.gamma_j, self.rho0DetJ0w_j,
                self.Jac0inv9_j, self.tables, self.h0,
                h1order=float(self.opt.order_v), cfl=self.opt.cfl,
                use_viscosity=self.use_visc, use_vorticity=self.use_vort,
                pallas=(self.opt.use_pallas and self.use_visc
                        and self.dtype == jnp.float32),
                oz=None if self.oz is None else self.oz["qup"])
        return qop.qupdate(
            x_e, v_e, S["e"], self.gamma_j, self.rho0DetJ0w_j,
            self.Jac0inv_j, self.tables, self.h0,
            dim=d, h1order=float(self.opt.order_v), cfl=self.opt.cfl,
            use_viscosity=self.use_visc, use_vorticity=self.use_vort)

    def _assemble(self, u_e):
        """(..., NE, nd) E-vector assembly to the L-vector."""
        if self._sm is not None:
            return structured.e_to_l_struct(u_e, self._sm)
        if self._inc is not None:
            return mop.e_to_l_gather(u_e, self._inc, self._incmask)
        return mop.e_to_l(u_e, self.gather, self.ndof)

    def _gather_e(self, u):
        """(C, ndof) L-vector -> (NE, C, nd) E-vector."""
        if self._sm is not None:
            return jnp.swapaxes(structured.l_to_e_struct(u, self._sm), 0, 1)
        return u[:, self.gather].transpose(1, 0, 2)

    def _force_rhs_raw(self, sJit):
        """F . 1 assembled to the H1 L-vector (the sw_force-timed part of
        SolveVelocity, laghos_solver.cpp:354)."""
        d = self.dim
        if isinstance(sJit, tuple) and len(sJit) == 4:
            # 2D q-lattice stress (4-tuple; the 3D forms are 9-tuples)
            from .ops import lattice as lop

            y = lop.force_one_lattice_2d(
                sJit, self._lat["Ts"], self._lat["Tg"]).reshape(d, -1)
            return jnp.where(jnp.abs(y) < self.ftz_eps2, 0.0, y)
        if isinstance(sJit, tuple) and sJit[0].ndim == 3:
            # q-lattice stress: reverse banded chains assemble the
            # L-vector directly (F . 1; the L2 "ones" evaluate to 1)
            from .ops import lattice as lop

            if self._lat_oz is not None:
                from .ops import lattice_oz as lzo

                y = lzo.force_one_lattice_oz(
                    sJit, self._lat_oz,
                    n_slices=self.opt.ozaki_rhs_slices or None
                ).reshape(d, -1)
            else:
                y = lop.force_one_lattice(sJit, self._lat["Ts"],
                                          self._lat["Tg"]).reshape(d, -1)
            return jnp.where(jnp.abs(y) < self.ftz_eps2, 0.0, y)
        if isinstance(sJit, tuple):
            if self.oz is not None:
                Fone = fop.force_mult9_oz(self.one_l2, sJit,
                                          self.oz["force"],
                                          ftz_eps2=self.ftz_eps2)
            else:
                Fone = fop.force_mult9(self.one_l2, sJit, self.tables,
                                       ftz_eps2=self.ftz_eps2)
        else:
            Fone = fop.force_mult(self.one_l2, sJit, self.tables, dim=d,
                                  ftz_eps2=self.ftz_eps2)  # (NE, d, nd)
        return self._assemble(jnp.swapaxes(Fone, 0, 1))

    def _prep_velocity_rhs(self, raw):
        """rhs.Neg(), RT gravity source, essential-dof elimination."""
        rhs = -raw
        if self.rt_rhs is not None:
            rhs = rhs + self.rt_rhs
        return jnp.where(self.ess_mask_j, 0.0, rhs)

    def _h1_apply_bc(self, u):
        d = self.dim
        if self._lat_oz is not None:
            from .ops import lattice_oz as lzo

            y = lzo.mass_apply_lattice_oz(u, self._lat_oz,
                                          self._lat["Dq"],
                                          self._lat_dims)
            return jnp.where(self.ess_mask_j, 0.0, y)
        if self._lat is not None:
            from .ops import lattice as lop

            y = lop.mass_apply_lattice(u, self._lat["Ts"],
                                       self._lat["Dq"], self._lat_dims)
            return jnp.where(self.ess_mask_j, 0.0, y)
        ue = jnp.swapaxes(self._gather_e(u), 0, 1)
        ue = mop.mass_apply_e(ue, self.massD, self.tables["H1B"], d,
                              Bd=self.tables.get("H1Bd"),
                              oz=None if self.oz is None else self.oz["h1"])
        y = self._assemble(ue)
        return jnp.where(self.ess_mask_j, 0.0, y)

    def _precond_velocity(self, r):
        if self._lat is not None and "kron" in self._lat:
            from .ops import lattice as lop

            return lop.kron_precond_apply(r, self._lat["kron"],
                                          self._lat_dims)
        if self._schwarz is None:
            return r * self.h1_dinv[None, :]
        # element-block additive Schwarz: symmetric (SPD) via the
        # 1/sqrt(multiplicity) counting weights on both sides
        Ainv, w = self._schwarz
        rw = jnp.where(self.ess_mask_j, 0.0, r) * w[None, :]
        re = self._gather_e(rw)                     # (NE, d, nd)
        ye = jnp.einsum("eij,edj->edi", Ainv, re)
        y = self._assemble(jnp.swapaxes(ye, 0, 1)) * w[None, :]
        return jnp.where(self.ess_mask_j, 0.0, y)

    def _cg_velocity_ir(self, rhs, x0=None):
        """Mixed-precision iterative-refinement velocity mass solve
        (Ozaki lattice mode): inner Jacobi-CG sweeps on an f32 shadow
        of the banded lattice operator, outer residuals through the
        f64-accurate int8-MXU apply.  Stops on the SAME criterion as
        the reference's f64 CG (preconditioned residual dot vs its
        initial value, laghos_solver.cpp:264-284) — each outer re-
        scales the correction equation into f32 range, so the refined
        solution reaches plain-f64-CG backward error (Carson & Higham
        2018) at a fraction of the all-Ozaki cost.

        Returned iteration count = total operator applies (inner f32
        sweeps + one Ozaki apply per outer), the honest analog of the
        reference's CG iteration count for FOM accounting."""
        from .ops import lattice as lop

        ess = self.ess_mask_j
        dinv = self.h1_dinv[None, :]
        Ts32 = self._lat32["Ts"]
        Dq32 = self._lat32["Dq"]
        dinv32 = dinv.astype(jnp.float32)
        tol = self.opt.cg_tol
        f64 = self.dtype

        def apply32(u):
            y = lop.mass_apply_lattice(u, Ts32, Dq32, self._lat_dims)
            return jnp.where(ess, 0.0, y)

        # residual-apply slice count: the Ozaki truncation 2^-7S must
        # sit ~a decade below the residual target cg_tol (6 slices =
        # 2^-42 for the reference's 1e-8; tighter tolerances widen it)
        s_res = min(8, max(4, int(np.ceil(
            (-np.log2(tol) + 3.4) / 7.0))))
        # incremental-update slice count: after the first outer the
        # correction dx is ≤ ~kappa*inner_tol of x, and the Ozaki
        # truncation is RELATIVE TO ‖dx‖ (split_dyn normalizes by the
        # operand's own exponents), so r <- r - A dx tolerates fewer
        # slices for the same absolute residual accuracy — the exact
        # analog of plain f64 CG's incrementally-tracked residual.
        # One fewer (not two): at s_lo = s_res-2 = 4 the ~2.2e-8
        # relative truncation through the 6 chained contraction stages
        # times shock-row correction magnitudes lands at ~2e-11*|Ax| —
        # exactly the 1e-11 convergence-test level, so solves stop
        # under-converged and RK2Avg total-energy drift degrades
        # 2e-13 -> 1e-11 (measured, round-5 bisect).  s_res-1 = 5 puts
        # the truncation at ~2.7e-13 for +0.7 ms/outer.
        s_lo = max(3, s_res - 1)

        def apply_res(u, n_slices=None):
            from .ops import lattice_oz as lzo

            y = lzo.mass_apply_lattice_oz(u, self._lat_oz,
                                          self._lat["Dq"],
                                          self._lat_dims,
                                          n_slices=n_slices or s_res)
            return jnp.where(ess, 0.0, y)

        def rdot(r):
            return jnp.sum(r * r * dinv, axis=-1)

        if x0 is None:
            x = jnp.zeros_like(rhs)
            r = rhs
        else:
            x = x0
            r = rhs - apply_res(x0)
        target = rdot(rhs) * (tol * tol)
        # inner tolerance: each outer re-scales r, so f32's ~1e-7 floor
        # applies per-outer, not globally; ~1e-5 lands cg_tol 1e-8 in
        # two outers (measured on TPU: fewer Ozaki residual applies
        # beats fewer inner f32 sweeps)
        inner_tol = self.opt.cg_ir_inner_tol
        inner_max = min(self.opt.cg_max_iter, 100)

        def cond(st):
            x, r, it, outers, active = st
            return jnp.logical_and(jnp.any(active), outers < 8)

        if "kron" in self._lat32:
            kron32 = self._lat32["kron"]

            def prec32(rr):
                return lop.kron_precond_apply(rr, kron32, self._lat_dims)
        else:
            def prec32(rr):
                return rr * dinv32

        def body(st):
            x, r, it, outers, active = st
            # inner sweeps run single-pass bf16 MXU matmuls BY DESIGN:
            # the outer loop measures the true residual through the
            # f64-accurate Ozaki apply and iterates until the reference
            # criterion holds, so inner operator error only costs
            # iterations, never accuracy (textbook mixed-precision IR).
            # (The package default is 3-pass f32, laghos_tpu/__init__.py;
            # this context opts just the inner solve back into speed.)
            with jax.default_matmul_precision(self.opt.cg_ir_inner_mxu):
                res = cg(apply32, r.astype(jnp.float32), inner_tol,
                         inner_max, precond=prec32)
            dx = jnp.where(active[:, None], res.x.astype(f64), 0.0)
            x = x + dx
            if self.opt.cg_ir_inc:
                # incremental residual: full slices on the first outer
                # (dx ~ x), the cheaper s_lo split once dx is a
                # correction
                r = r - jax.lax.cond(
                    outers == 0,
                    lambda u: apply_res(u),
                    lambda u: apply_res(u, n_slices=s_lo), dx)
            else:
                r = rhs - apply_res(x)
            it = it + jnp.where(active, res.iters + 1, 0)
            active = jnp.logical_and(active, rdot(r) > target)
            return (x, r, it, outers + 1, active)

        active0 = rdot(r) > target
        it0 = jnp.zeros(rhs.shape[0], jnp.int32)
        x, r, it, outers, active = jax.lax.while_loop(
            cond, body, (x, r, it0, jnp.asarray(0), active0))
        return x, jnp.sum(it)

    def _cg_velocity(self, rhs, x0=None):
        d = self.dim
        if self.p_assembly:
            if self._lat32 is not None and self.opt.cg_ir:
                return self._cg_velocity_ir(rhs, x0=x0)
            res = cg(self._h1_apply_bc, rhs, self.opt.cg_tol,
                     self.opt.cg_max_iter,
                     precond=self._precond_velocity, x0=x0)
            return res.x, jnp.sum(res.iters)
        # FA: one coupled CG over all components (laghos_solver.cpp:400-439)
        flat = rhs.reshape(1, -1)

        if self._h1_bcoo is not None:
            A = self._h1_bcoo

            def apply_flat(u):
                y = (A @ u.reshape(d, -1).T).T
                return jnp.where(self.ess_mask_j, 0.0, y).reshape(1, -1)
        else:
            def apply_flat(u):
                return self._h1_apply_bc(u.reshape(d, -1)).reshape(1, -1)

        dinv = jnp.broadcast_to(self.h1_dinv[None, :], (d, self.ndof))
        dinv = jnp.where(self.ess_mask_j, 1.0, dinv).reshape(1, -1)
        res = cg(apply_flat, flat, self.opt.cg_tol, self.opt.cg_max_iter,
                 precond=lambda r: r * dinv)
        return res.x.reshape(d, -1), jnp.sum(res.iters)

    def _solve_velocity(self, sJit, x0=None):
        return self._cg_velocity(self._prep_velocity_rhs(
            self._force_rhs_raw(sJit)), x0=x0)

    def _taylor_source(self, S):
        """(f, psi) with the Taylor-Green forcing on the current mesh
        (laghos_solver.cpp:455-465, laghos_solver.hpp:207-218)."""
        d = self.dim
        x_e = self._gather_e(S["x"])
        J = qop.jacobians(x_e, self.tables["H1B"], self.tables["H1G"], d)
        from .ops import smallmat

        detJ = smallmat.det(J, d)
        xt = x_e.reshape((self.NE, d) + (self.nd1,) * d)
        xq = top.eval_values(xt, self.tables["H1B"], d).reshape(
            self.NE, d, self.NQ)
        X, Y = xq[:, 0], xq[:, 1]
        pi = jnp.pi
        fq_ = (3.0 / 8.0) * pi * (jnp.cos(3 * pi * X) * jnp.cos(pi * Y)
                                  - jnp.cos(pi * X) * jnp.cos(3 * pi * Y))
        integrand = self.tables["W"][None, :] * detJ * fq_
        it = integrand.reshape((self.NE,) + (self.nq1,) * d)
        out = top.eval_transpose(it, self.tables["L2B"].T, d)
        return out.reshape(self.NE, self.ld)

    def _force_transpose(self, sJit, v):
        d = self.dim
        if isinstance(sJit, tuple) and len(sJit) == 4:
            from .ops import lattice as lop

            return lop.force_transpose_lattice_2d(
                v, sJit, self._lat, self._lat_dims, self._edims,
                self.tables)
        if isinstance(sJit, tuple) and sJit[0].ndim == 3:
            from .ops import lattice as lop

            return lop.force_transpose_lattice(
                v, sJit, self._lat, self._lat_dims, self._edims,
                self.tables, oz=self._lat_oz,
                oz_slices=self.opt.ozaki_rhs_slices or None)
        v_e = self._gather_e(v)
        if isinstance(sJit, tuple):
            if self.oz is not None:
                return fop.force_mult_transpose9_oz(v_e, sJit,
                                                    self.oz["forceT"])
            return fop.force_mult_transpose9(v_e, sJit, self.tables)
        return fop.force_mult_transpose(v_e, sJit, self.tables, dim=d)

    def _cg_energy(self, e_rhs, x0=None):
        d = self.dim
        if self.p_assembly:
            def apply_A(u):
                ue = u.reshape(self.NE, self.ld)
                ue = mop.mass_apply_e(
                    ue, self.massD, self.tables["L2B"], d,
                    Bd=self.tables.get("L2Bd"),
                    oz=None if self.oz is None else self.oz["l2"])
                return ue.reshape(1, -1)

            res = cg(apply_A, e_rhs.reshape(1, -1), self.opt.cg_tol,
                     self.opt.cg_max_iter,
                     x0=None if x0 is None else x0.reshape(1, -1))
            iters = jnp.maximum(res.iters[0], 1)
            return res.x.reshape(self.NE, self.ld), iters
        de = jnp.einsum("eij,ej->ei", self.Me_inv, e_rhs)
        return de, jnp.asarray(self.NE)

    def _solve_energy(self, S, sJit, v, x0=None):
        e_rhs = self._force_transpose(sJit, v)
        if self.source == 1:
            e_rhs = e_rhs + self._taylor_source(S)
        return self._cg_energy(e_rhs, x0=x0)

    def _mult(self, S, sJit=None, warm=None):
        """dS/dt (laghos_solver.cpp:308-327). Returns (dS, dtmin, stats).

        When `sJit` is provided, the quadrature data is reused instead of
        recomputed — the reference's qdata memoization
        (laghos_solver.cpp:807-814): stage 1 of every accepted step reuses
        the qdata computed by the previous GetTimeStepEstimate.
        `warm` is an optional per-step dict cell carrying the previous
        stage's accelerations as CG warm starts (Options.cg_warm_start).
        """
        if sJit is None:
            sJit, dtmin = self._qupdate(S)
        else:
            dtmin = jnp.asarray(jnp.inf, self.dtype)
        x0v = warm.get("dv") if warm is not None else None
        x0e = warm.get("de") if warm is not None else None
        dv, h1it = self._solve_velocity(sJit, x0=x0v)
        de, l2it = self._solve_energy(S, sJit, S["v"], x0=x0e)
        if warm is not None:
            warm["dv"], warm["de"] = dv, de
        dS = {"x": S["v"], "v": dv, "e": de}
        return dS, dtmin, (h1it, l2it)

    def _mult_timed(self, S, tim, sJit=None):
        """Phase-timed RHS evaluation with device fences, for FOM runs
        (timing semantics of laghos_solver.cpp:349-489).  A provided sJit
        reuses the previous estimate's qdata without charging sw_qdata,
        exactly like the reference's memoized stage 1."""
        from .timing import block

        import jax.numpy as jnp

        if sJit is None:
            with tim.phase("qdata"):
                sJit, dtmin = block(self._jq(S))
            tim.quad_tstep += self.NE
        else:
            dtmin = jnp.asarray(jnp.inf, self.dtype)
        with tim.phase("force"):
            raw = block(self._jforce1(sJit))
        B = self._jprep_v(raw)
        with tim.phase("cgH1"):
            dv, h1it = block(self._jcg_v(B))
        tim.H1iter += int(h1it)
        with tim.phase("force"):
            e_rhs = block(self._jfT(sJit, S["v"]))
        if self.source == 1:
            e_rhs = e_rhs + self._jsrc(S)
        with tim.phase("cgL2"):
            de, l2it = block(self._jcg_e(e_rhs))
        tim.L2iter += int(l2it)
        dS = {"x": S["v"], "v": dv, "e": de}
        return dS, dtmin, (h1it, l2it)

    def _rk2avg_stage_timed(self, Scur, v0, dt, tim):
        from .timing import block

        with tim.phase("qdata"):
            sJit, dtm = block(self._jq(Scur))
        tim.quad_tstep += self.NE
        with tim.phase("force"):
            raw = block(self._jforce1(sJit))
        B = self._jprep_v(raw)
        with tim.phase("cgH1"):
            dv, h1it = block(self._jcg_v(B))
        tim.H1iter += int(h1it)
        V = v0 + 0.5 * dt * dv
        with tim.phase("force"):
            e_rhs = block(self._jfT(sJit, V))
        if self.source == 1:
            e_rhs = e_rhs + self._jsrc(Scur)
        with tim.phase("cgL2"):
            de, l2it = block(self._jcg_e(e_rhs))
        tim.L2iter += int(l2it)
        return {"x": V, "v": dv, "e": de}, dtm, (h1it, l2it)

    # -------------------------------------------------- steppers ---------
    def _step(self, S, dt, count_stage1: bool, mult=None, rk2avg_stage=None,
              sJit1=None, mult1=None):
        """One RK step; returns (S_new, dt_min_of_counted_stages, stats).

        `mult`/`mult1`/`rk2avg_stage` overrides let distributed wrappers
        (parallel/slab_hydro.py) reuse the stepper tableaus with local
        per-device operators."""
        warm = {} if self.opt.cg_warm_start else None
        if mult is None:
            mult = (lambda Sc: self._mult(Sc, warm=warm))
        if mult1 is None:
            mult1 = (lambda Sc: mult(Sc)) if sJit1 is None else \
                (lambda Sc: self._mult(Sc, sJit1, warm=warm))
        inf = jnp.asarray(jnp.inf, self.dtype)
        h1tot = jnp.asarray(0)
        l2tot = jnp.asarray(0)
        dtacc = inf

        def acc(dtmin, stats, counted):
            nonlocal dtacc, h1tot, l2tot
            if counted:
                dtacc = jnp.minimum(dtacc, dtmin)
            h1tot = h1tot + stats[0]
            l2tot = l2tot + stats[1]

        ax = lambda a, c, b: jax.tree_util.tree_map(
            lambda u, v: u + c * v, a, b)

        s = self.opt.ode_solver
        if s == 7:
            S_new = self._rk2avg(S, dt, count_stage1, acc, rk2avg_stage,
                                 sJit1=sJit1, warm=warm)
        elif s == 1:
            k1, dtm, st = mult1(S)
            acc(dtm, st, count_stage1)
            S_new = ax(S, dt, k1)
        elif s == 2:
            a = 0.5
            b = 1.0 / (2.0 * a)
            k1, dtm, st = mult1(S)
            acc(dtm, st, count_stage1)
            y = ax(S, a * dt, k1)
            k2, dtm, st = mult(y)
            acc(dtm, st, True)
            S_new = ax(ax(S, (1.0 - b) * dt, k1), b * dt, k2)
        elif s == 3:
            k1, dtm, st = mult1(S)
            acc(dtm, st, count_stage1)
            y = ax(S, dt, k1)
            k2, dtm, st = mult(y)
            acc(dtm, st, True)
            y = jax.tree_util.tree_map(
                lambda s0, yy, kk: 0.75 * s0 + 0.25 * (yy + dt * kk),
                S, y, k2)
            k3, dtm, st = mult(y)
            acc(dtm, st, True)
            S_new = jax.tree_util.tree_map(
                lambda s0, yy, kk: (s0 + 2.0 * (yy + dt * kk)) / 3.0,
                S, y, k3)
        elif s == 4:
            k1, dtm, st = mult1(S)
            acc(dtm, st, count_stage1)
            y = ax(S, dt / 2, k1)
            k2, dtm, st = mult(y)
            acc(dtm, st, True)
            y = ax(S, dt / 2, k2)
            k3, dtm, st = mult(y)
            acc(dtm, st, True)
            y = ax(S, dt, k3)
            k4, dtm, st = mult(y)
            acc(dtm, st, True)
            S_new = jax.tree_util.tree_map(
                lambda s0, a1, a2, a3, a4:
                s0 + dt / 6.0 * (a1 + 2 * a2 + 2 * a3 + a4),
                S, k1, k2, k3, k4)
        elif s == 6:
            S_new = self._rk6(S, dt, count_stage1, acc, mult)
        else:
            raise ValueError(f"unknown ode solver {s}")
        return S_new, dtacc, (h1tot, l2tot)

    def _rk2avg(self, S, dt, count_stage1, acc, stage_fn=None, sJit1=None,
                warm=None):
        """Energy-conserving two-stage average scheme
        (laghos_solver.cpp:1447-1487)."""
        v0 = S["v"]
        first = [sJit1]

        def default_stage(Scur):
            if first[0] is not None:
                sJit, dtm = first[0], jnp.asarray(jnp.inf, self.dtype)
                first[0] = None
            else:
                sJit, dtm = self._qupdate(Scur)
            x0v = warm.get("dv") if warm is not None else None
            x0e = warm.get("de") if warm is not None else None
            dv, h1it = self._solve_velocity(sJit, x0=x0v)
            V = v0 + 0.5 * dt * dv
            de, l2it = self._solve_energy(Scur, sJit, V, x0=x0e)
            if warm is not None:
                warm["dv"], warm["de"] = dv, de
            return {"x": V, "v": dv, "e": de}, dtm, (h1it, l2it)

        def stage(Scur, counted):
            if stage_fn is None:
                dS, dtm, st = default_stage(Scur)
            else:
                dS, dtm, st = stage_fn(Scur, v0, dt)
            acc(dtm, st, counted)
            return dS

        dS = stage(S, count_stage1)
        Smid = jax.tree_util.tree_map(lambda a, b: a + 0.5 * dt * b, S, dS)
        dS = stage(Smid, True)
        return jax.tree_util.tree_map(lambda a, b: a + dt * b, S, dS)

    def _rk6(self, S, dt, count_stage1, acc, mult):
        """Verner's 8-stage 6th-order method (mfem RK6Solver tableau)."""
        a = _RK6_A
        b = _RK6_B
        ks = []
        for i in range(8):
            y = S
            for j in range(i):
                if a[i][j] != 0.0:
                    y = jax.tree_util.tree_map(
                        lambda u, v, c=a[i][j]: u + dt * c * v, y, ks[j])
            k, dtm, st = mult(y)
            acc(dtm, st, count_stage1 if i == 0 else True)
            ks.append(k)
        out = S
        for j in range(8):
            if b[j] != 0.0:
                out = jax.tree_util.tree_map(
                    lambda u, v, c=b[j]: u + dt * c * v, out, ks[j])
        return out

    # ------------------------------------------- ctx-as-arguments -------
    # Large per-mesh arrays are passed to every jitted program as
    # arguments (a "ctx" pytree) instead of being baked in as HLO
    # constants.  During tracing the ctx tracers are temporarily bound
    # over the instance attributes so the whole method tree picks them
    # up unchanged; outside tracing the attributes hold the real arrays.
    _CTX_NAMES = ("gather", "_inc", "_incmask", "massD", "h1_dinv",
                  "_schwarz", "Me_inv", "rt_rhs", "ess_mask_j", "gamma_j",
                  "rho0DetJ0w_j", "Jac0inv_j", "Jac0inv9_j", "one_l2",
                  "_lat", "_lat_oz", "_lat32")

    def _ctx(self):
        return {k: getattr(self, k, None) for k in self._CTX_NAMES}

    @contextlib.contextmanager
    def _bind_ctx(self, ctx):
        old = {k: getattr(self, k, None) for k in ctx}
        try:
            for k, v in ctx.items():
                setattr(self, k, v)
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    def _ctx_jit(self, fn, donate_argnums=()):
        def wrapped(ctx, *args):
            with self._bind_ctx(ctx):
                return fn(*args)

        jitted = jax.jit(wrapped, donate_argnums=tuple(
            1 + i for i in donate_argnums))

        def call(*args):
            return jitted(self._ctx(), *args)

        return call

    # --------------------------------------- on-device adaptive loop -----
    def _segment_impl(self, S, t, dt, ti, steps, sj, count_stage1,
                      t_final, max_steps, vis_steps, chk):
        """Run accepted steps ON DEVICE until the next vis/check pause
        or the end of the run — the full adaptive-dt control flow of
        laghos.cpp:741-790 (truncation, rejection with 0.85 backoff,
        1.02 growth, the reference's exact last_step/rejection quirks)
        as a lax.while_loop.  The host syncs one small scalar tuple per
        SEGMENT instead of per step (~25 ms tunnel latency per sync).

        chk: int32 array of extra pause steps (the --checks table);
        pass [-1] for none."""
        return segment_loop(
            self._qupdate,
            lambda Sc, dt_eff, sJ1: self._step(Sc, dt_eff, True,
                                               sJit1=sJ1),
            self._guard_finite, self.dtype,
            S, t, dt, ti, steps, sj, count_stage1,
            t_final, max_steps, vis_steps, chk)

    def run_segment(self, S, t, dt, ti, steps, sj, count_stage1,
                    t_final, max_steps, vis_steps, chk):
        if not hasattr(self, "_segment_jit"):
            self._segment_jit = self._ctx_jit(self._segment_impl)
        dtype = self.dtype
        return self._segment_jit(
            S, jnp.asarray(t, dtype), jnp.asarray(dt, dtype),
            jnp.asarray(ti), jnp.asarray(steps), sj,
            jnp.bool_(count_stage1), jnp.asarray(t_final, dtype),
            jnp.asarray(max_steps), jnp.asarray(vis_steps),
            jnp.asarray(chk, dtype=jnp.int32))

    # -------------------------------------------------- public API -------
    def advance(self, S, dt, count_stage1=False, sJit1=None):
        """Step + post-step dt estimate, one compiled call.

        Mirrors one iteration of the driver loop body (laghos.cpp:742-778):
        the returned dt_est is the min over every qupdate since the last
        reset — the counted RK stage states plus the final state.  The
        final qupdate's stress data is returned for reuse as the next
        step's stage-1 qdata (the reference's memoization,
        laghos_solver.cpp:807-814); pass it back as `sJit1`.
        """
        key = (bool(count_stage1), sJit1 is not None)
        if key not in self._advance_cache:
            if key[1]:
                def f(S, dt, sj):
                    S_new, dtacc, stats = self._step(S, dt, key[0],
                                                     sJit1=sj)
                    sj_new, dt_final = self._qupdate(S_new)
                    dt_est = self._guard_finite(
                        S_new, jnp.minimum(dtacc, dt_final))
                    return S_new, dt_est, stats, sj_new
            else:
                def f(S, dt, sj):
                    S_new, dtacc, stats = self._step(S, dt, key[0])
                    sj_new, dt_final = self._qupdate(S_new)
                    dt_est = self._guard_finite(
                        S_new, jnp.minimum(dtacc, dt_final))
                    return S_new, dt_est, stats, sj_new
            # the caller (driver.run) never reuses the memoized stage-1
            # qdata after the call — donate its HBM to the new qdata
            self._advance_cache[key] = self._ctx_jit(
                f, donate_argnums=(2,) if key[1] else ())
        return self._advance_cache[key](S, dt, sJit1)

    def advance_timed(self, S, dt, tim, count_stage1=False, sJit1=None):
        """Like `advance` but with per-phase stopwatches (FOM mode)."""
        from .timing import block

        first = [None if count_stage1 else sJit1]

        def mult(s):
            sj, first[0] = first[0], None
            return self._mult_timed(s, tim, sJit=sj)

        S_new, dtacc, stats = self._step(
            S, dt, count_stage1, mult=mult,
            rk2avg_stage=lambda s, v0, dtt: self._rk2avg_stage_timed(
                s, v0, dtt, tim))
        with tim.phase("qdata"):
            sj_new, dt_final = block(self._jq(S_new))
        tim.quad_tstep += self.NE
        return S_new, jnp.minimum(dtacc, dt_final), stats, sj_new

    def _guard_finite(self, S_new, dt_est):
        """Force step rejection for non-finite states.

        The reference rejects inverted/blown states through dt_est = 0
        (laghos_solver.cpp:1144-1148); NaN/Inf states (e.g. after a solver
        breakdown) must not slip past the `dt_est < dt` comparison, since
        NaN compares false."""
        ok = jnp.isfinite(jnp.sum(S_new["v"]) + jnp.sum(S_new["e"])
                          + jnp.sum(S_new["x"]))
        return jnp.where(ok, dt_est, 0.0)

    def _dt_estimate_impl(self, S):
        sJit, dtmin = self._qupdate(S)
        return dtmin, sJit

    def dt_estimate(self, S):
        return self._estimate(S)[0]

    def dt_estimate_full(self, S):
        """(dt_est, sJit) — seed for the stage-1 memoization."""
        return self._estimate(S)

    def _energies_impl(self, S):
        """(internal, kinetic) energy integrals
        (laghos_solver.cpp:640-697)."""
        d = self.dim
        et = S["e"].reshape((self.NE,) + (self.l1d,) * d)
        e_q = top.eval_values(et, self.tables["L2B"], d).reshape(
            self.NE, self.NQ)
        ie = jnp.sum(self.rho0DetJ0w_j * e_q)
        v_e = self._gather_e(S["v"])
        vt = v_e.reshape((self.NE, d) + (self.nd1,) * d)
        v_q = top.eval_values(vt, self.tables["H1B"], d).reshape(
            self.NE, d, self.NQ)
        ke = 0.5 * jnp.sum(self.rho0DetJ0w_j * jnp.sum(v_q**2, axis=1))
        return ie, ke

    def energies(self, S):
        return self._energies(S)

    def e_norm(self, S):
        """||e||_2 of the L2 coefficient vector (the driver's |e| print,
        laghos.cpp:794-825)."""
        return float(jnp.sqrt(jnp.sum(S["e"] ** 2)))

    def compute_density(self, S):
        """Project current density rho = rho0 detJ0 / detJ onto L2
        (laghos_solver.cpp:542-563)."""
        d = self.dim
        x_e = self._gather_e(S["x"])
        J = qop.jacobians(x_e, self.tables["H1B"], self.tables["H1G"], d)
        from .ops import smallmat

        detJ = smallmat.det(J, d)
        D = self.tables["W"][None, :] * detJ
        M = mop.l2_mass_matrices(D, self.tables["L2B"], d)
        # rhs_j = sum_q psi_j(q) rho0DetJ0w(q)
        rt = self.rho0DetJ0w_j.reshape((self.NE,) + (self.nq1,) * d)
        rhs = top.eval_transpose(rt, self.tables["L2B"].T, d).reshape(
            self.NE, self.ld)
        return jnp.linalg.solve(M, rhs[..., None])[..., 0]


# Verner's 6(5) 8-stage tableau as used by mfem::RK6Solver.
_RK6_A = [
    [],
    [1.0 / 6.0],
    [4.0 / 75.0, 16.0 / 75.0],
    [5.0 / 6.0, -8.0 / 3.0, 5.0 / 2.0],
    [-165.0 / 64.0, 55.0 / 6.0, -425.0 / 64.0, 85.0 / 96.0],
    [12.0 / 5.0, -8.0, 4015.0 / 612.0, -11.0 / 36.0, 88.0 / 255.0],
    [-8263.0 / 15000.0, 124.0 / 75.0, -643.0 / 680.0, -81.0 / 250.0,
     2484.0 / 10625.0, 0.0],
    [3501.0 / 1720.0, -300.0 / 43.0, 297275.0 / 52632.0, -319.0 / 2322.0,
     24068.0 / 84065.0, 0.0, 3850.0 / 26703.0],
]
_RK6_B = [3.0 / 40.0, 0.0, 875.0 / 2244.0, 23.0 / 72.0, 264.0 / 1955.0,
          0.0, 125.0 / 11592.0, 43.0 / 616.0]
