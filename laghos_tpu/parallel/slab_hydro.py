"""Production structured domain decomposition: slab and pencil halos.

The TPU-native image of the reference's MPI domain decomposition
(laghos_solver.cpp:362-398, SURVEY §2.4.1/§2.5), built to inherit every
single-chip fast path:

  * the raster-ordered Cartesian mesh is partitioned into contiguous
    element SLABS along its last axis (1D device mesh) or PENCILS along
    its last two axes (2D device mesh, `mesh_shape=(Dz, Dy)`), so each
    device's dof set is a contiguous block of lattice planes — the halo
    per partitioned axis is ONE lattice plane shared with each neighbor;
  * per-device kernels are the SAME jitted pieces as the conforming
    `Hydro` (scalarized 3D qupdate, structured E<->L transforms on the
    local lattice, dense/Ozaki contractions, whole-lattice banded
    matmuls, batched CG) — the stepper tableaus are reused via
    Hydro._step's mult/stage overrides;
  * communication is `lax.ppermute` of boundary-plane SLICES after each
    H1 assembly (no index gathers) — one exchange per partitioned axis,
    sequenced so corner/edge contributions ride two hops exactly like a
    staged MPI halo — plus `psum` for CG dots/energies and `pmin` for
    the dt estimate: O(surface) bytes per operator apply riding ICI,
    exactly the reference's halo structure;
  * the driver-visible API (advance / dt_estimate_full / energies /
    e_norm, with stage-1 qdata memoization and sJit donation) matches
    `Hydro`, so laghos_tpu.driver.run works unchanged.

L2 (energy) data is element-local and never communicated, mirroring
laghos_solver.cpp:442-518 where the L2 mass needs no prolongation.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import force as fop
from ..ops import mass as mop
from ..ops import qupdate as qop
from ..ops import structured
from ..solvers.cg import cg

AXIS = "dd"


def _identity_structmaps(dims_loc, p):
    lat = [n * p + 1 for n in dims_loc]
    ndof = int(np.prod(lat))
    ne = int(np.prod(dims_loc))
    ident = np.arange(ndof, dtype=np.int32)
    e_id = np.arange(ne, dtype=np.int32)
    return structured.StructMaps(dims=tuple(dims_loc), p=p, perm=ident,
                                 inv=ident, e_mesh_at_raster=e_id,
                                 e_raster_at_mesh=e_id)


class SlabHydro:
    """Distributed view of a conforming `Hydro` over a 1D (slab) or 2D
    (pencil) device mesh.

    `mesh_shape=(Dz,)` partitions the slowest element axis (slabs);
    `mesh_shape=(Dz, Dy)` additionally partitions the next axis
    (pencils) — `n_devices` alone means slabs, matching round-2
    behavior byte-for-byte.
    """

    def __init__(self, hydro, n_devices=None, devices=None,
                 mesh_shape=None):
        h = self.h = hydro
        if h._sm is None:
            raise ValueError("slab mode needs a raster-ordered Cartesian "
                             "mesh (structured transforms active)")
        if not h.p_assembly:
            raise ValueError("slab mode covers the partial-assembly path")
        devs = devices if devices is not None else jax.devices()
        if mesh_shape is None:
            mesh_shape = (len(devs) if n_devices is None else n_devices,)
        mesh_shape = tuple(int(x) for x in mesh_shape)
        Dt = int(np.prod(mesh_shape))
        devs = devs[:Dt]
        if len(devs) != Dt:
            raise ValueError(f"mesh_shape {mesh_shape} needs {Dt} devices,"
                             f" have {len(devs)}")
        self.D = Dt
        self.mesh_shape = mesh_shape
        d = h.dim
        p = h.opt.order_v
        dims = h._sm.dims                    # fastest-first (x, y, z)
        npart = len(mesh_shape)
        if npart > d:
            raise ValueError("more partitioned axes than mesh dimensions")
        self.names = (AXIS,) if npart == 1 else tuple(
            AXIS + (str(i) if i else "") for i in range(npart))
        self.mesh = Mesh(np.array(devs).reshape(mesh_shape), self.names)
        dims_loc = list(dims)
        for i, Dk in enumerate(mesh_shape):
            if dims[-1 - i] % Dk != 0:
                raise ValueError(
                    f"partitioned element-grid axis {dims[-1 - i]} must "
                    f"be divisible by the device-mesh axis {Dk}")
            dims_loc[-1 - i] = dims[-1 - i] // Dk
            if dims_loc[-1 - i] < 1:
                raise ValueError("partition thinner than one element")
        self.dims_loc = tuple(dims_loc)
        self.sm_loc = _identity_structmaps(self.dims_loc, p)
        # slowest-first ("grid") views used for all host-side splitting
        self.grid = tuple(reversed(dims))
        self.grid_loc = tuple(reversed(self.dims_loc))
        self.latg = tuple(n * p + 1 for n in self.grid)
        self.latg_loc = tuple(n * p + 1 for n in self.grid_loc)
        self.nloc = int(np.prod(self.latg_loc))
        self.nel_loc = h.NE // Dt
        self.dtype = h.dtype
        self.NE = h.NE
        self.ndof = h.ndof
        self._dev_tiles = list(itertools.product(
            *[range(Dk) for Dk in mesh_shape]))

        dt = h.dtype

        def _dof_slices(tile):
            """Global-lattice slices (slowest-first) of one device's
            overlapping dof block."""
            sl = [slice(None)] * len(self.latg)
            for i, k in enumerate(tile):
                w = self.grid_loc[i] * p
                sl[i] = slice(k * w, k * w + w + 1)
            return tuple(sl)

        self._dof_slices = _dof_slices

        def slice_dofs(u):
            """(C, ndof) -> (Dt, C, nloc) overlapping lattice blocks."""
            u = np.asarray(u)
            C = u.shape[0]
            ug = u.reshape((C,) + self.latg)
            return np.stack([
                ug[(slice(None),) + _dof_slices(t)].reshape(C, -1)
                for t in self._dev_tiles])

        def split_elems(A):
            """(NE, ...) -> (Dt, nel_loc, ...) contiguous grid chunks."""
            A = np.asarray(A)
            rest = A.shape[1:]
            Ag = A.reshape(self.grid + rest)
            out = []
            for t in self._dev_tiles:
                sl = [slice(None)] * len(self.grid)
                for i, k in enumerate(t):
                    n = self.grid_loc[i]
                    sl[i] = slice(k * n, (k + 1) * n)
                out.append(Ag[tuple(sl)].reshape((-1,) + rest))
            return np.stack(out)

        self._slice_dofs = slice_dofs
        self._split_elems = split_elems

        self.massD_l = jnp.asarray(split_elems(h.massD), dt)
        self.rw_l = jnp.asarray(split_elems(h.rho0DetJ0w_j), dt)
        self.gamma_l = jnp.asarray(split_elems(h.gamma_j), dt)
        self.one_l = jnp.asarray(split_elems(h.one_l2), dt)
        if h._sJ9:
            self.J0i_l = jnp.asarray(np.stack(
                [split_elems(a) for a in h.Jac0inv9_j], axis=1), dt)
        else:
            self.J0i_l = jnp.asarray(split_elems(h.Jac0inv_j), dt)
        self.ess_l = jnp.asarray(slice_dofs(h.ess_mask_j))
        self.dinv_l = jnp.asarray(slice_dofs(h.h1_dinv[None, :])[:, 0], dt)
        self.rt_l = (jnp.asarray(slice_dofs(h.rt_rhs), dt)
                     if h.rt_rhs is not None else None)
        self.S0 = {
            "x": jnp.asarray(slice_dofs(h.S0["x"]), dt),
            "v": jnp.asarray(slice_dofs(h.S0["v"]), dt),
            "e": jnp.asarray(split_elems(h.S0["e"]), dt),
        }

        # per-block whole-lattice operators (ops/lattice.py): each block
        # is itself a raster lattice, so the banded-matmul compute path
        # applies locally with the SAME plane halo exchange — multi-chip
        # inherits the full single-chip kernel work
        self.lat = None
        # (3D only here: the 2D whole-lattice qupdate landed later and
        # the per-block halo chains are specialized to the 3D tables;
        # 2D slabs keep the E-form kernels)
        if getattr(h, "_latq", False) and h.dim == 3:
            from ..ops import lattice as lop

            nq1 = h.nq1
            n_zyx = self.grid_loc
            self.lat_TB = tuple(
                jnp.asarray(lop.banded_eval_table(
                    np.asarray(h.tables["H1B"], np.float64), n), dt)
                for n in n_zyx)
            self.lat_TG = tuple(
                jnp.asarray(lop.banded_grad_table(
                    np.asarray(h.tables["H1G"], np.float64), n), dt)
                for n in n_zyx)
            self.lat_dims_loc = self.latg_loc

            def ql_split(A):
                A = split_elems(np.asarray(A, np.float64).reshape(
                    h.NE, -1))
                return np.stack([
                    lop.qlattice_weights(A[k], self.dims_loc, nq1)
                    for k in range(Dt)])

            NQ = h.NQ
            W = np.asarray(h.tables["W"], np.float64)
            self.lat_Dq_l = jnp.asarray(ql_split(h.massD), dt)
            self.lat_rw_l = jnp.asarray(ql_split(h.rho0DetJ0w_j), dt)
            self.lat_gam_l = jnp.asarray(ql_split(np.broadcast_to(
                np.asarray(h.gamma_j, np.float64)[:, None],
                (h.NE, NQ))), dt)
            self.lat_winv_l = jnp.asarray(ql_split(np.broadcast_to(
                1.0 / W[None, :], (h.NE, NQ))), dt)
            self.lat_h0e_l = jnp.asarray(ql_split(np.full(
                (h.NE, NQ), float(h.h0))), dt)
            self.lat_J0i_l = jnp.asarray(np.stack(
                [ql_split(h.Jac0inv[..., a, b])
                 for a in range(3) for b in range(3)], axis=1), dt)
            self.lat = True
        # f64 production mode (Options.ozaki): per-block int8-MXU Ozaki
        # banded chains + the mixed-precision IR velocity solve, the
        # same kernels as the conforming Hydro (hydro.py _cg_velocity_ir
        # / ops/lattice_oz.py) — the reference's MPI path runs identical
        # per-rank kernels (laghos_solver.cpp:362-398).  Every block has
        # the same local lattice shape, so the static int8 table splits
        # are replicated closure constants like lat_TB.
        self.lat_oz = None
        self.lat_TB32 = None
        if self.lat is not None and getattr(h, "_lat_oz", None) is not None:
            from ..ops import lattice_oz as lzo
            from ..ops import tensor as top

            B = np.asarray(h.tables["H1B"], np.float64)
            G = np.asarray(h.tables["H1G"], np.float64)
            l2b1 = np.asarray(h.tables["L2B"], np.float64)
            l2bd, _ = top.dense_ops(l2b1, np.zeros_like(l2b1), d)
            self.lat_oz = lzo.build_lattice_oz(
                B, G, l2bd, self.grid_loc, n_slices=h.opt.ozaki_slices)
            # f32 shadow of the banded tables for the IR inner sweeps
            self.lat_TB32 = tuple(T.astype(jnp.float32)
                                  for T in self.lat_TB)
        self._place()
        self._advance_cache = {}
        self._estimate = None
        self._energies = None

    # ------------------------------------------------------------------
    _LAT_CONSTS = ("lat_Dq_l", "lat_rw_l", "lat_gam_l", "lat_winv_l",
                   "lat_h0e_l", "lat_J0i_l")

    @property
    def _spec(self):
        return P(self.names)

    def _place(self):
        sh = NamedSharding(self.mesh, self._spec)
        put = partial(jax.device_put, device=sh)
        for name in ("massD_l", "rw_l", "gamma_l", "one_l", "J0i_l",
                     "ess_l", "dinv_l"):
            setattr(self, name, put(getattr(self, name)))
        if self.rt_l is not None:
            self.rt_l = put(self.rt_l)
        if self.lat is not None:
            for name in self._LAT_CONSTS:
                setattr(self, name, put(getattr(self, name)))
        self.S0 = {k: put(v) for k, v in self.S0.items()}

    def _consts(self):
        c = [self.massD_l, self.rw_l, self.gamma_l, self.one_l,
             self.J0i_l, self.ess_l, self.dinv_l]
        if self.rt_l is not None:
            c.append(self.rt_l)
        if self.lat is not None:
            c += [getattr(self, n) for n in self._LAT_CONSTS]
        return tuple(c)

    # ---------------- per-device operator set (runs under shard_map) ---
    def _local_ops(self, consts):
        """Build the local operator closures from per-device constants
        (leading device axis of size 1 already stripped)."""
        h = self.h
        d = h.dim
        opt = h.opt
        names = self.names
        latg_loc = self.latg_loc
        nlat = len(latg_loc)
        consts = list(consts)
        (massD, rw, gamma, one_l2, J0i, ess, dinv) = consts[:7]
        k = 7
        rt = None
        if self.rt_l is not None:
            rt = consts[k]
            k += 1
        lat = None
        if self.lat is not None:
            (Dq, lrw, lgam, lwinv, lh0e, lJ0i) = consts[k:k + 6]
            lat = {"Ts": self.lat_TB, "Tg": self.lat_TG, "Dq": Dq,
                   "rw": lrw, "gam": lgam, "winv": lwinv, "h0e": lh0e,
                   "J0i9": tuple(lJ0i[a] for a in range(9))}
        sm = self.sm_loc
        nloc = self.nloc

        # ownership: a dof on the first lattice plane of a partitioned
        # axis belongs to the lower neighbor (when one exists) — applied
        # per axis, so shared edges/corners get exactly one owner
        owned = jnp.ones(latg_loc, self.dtype)
        for i, name in enumerate(names):
            idx = jax.lax.axis_index(name)
            m = jnp.ones((latg_loc[i],), self.dtype)
            m_in = m.at[0].set(0.0)
            m = jnp.where(idx > 0, m_in, m)
            owned = owned * m.reshape((-1,) + (1,) * (nlat - 1 - i))
        owned = owned.reshape(-1)

        def gather_e(u):
            return jnp.swapaxes(structured.l_to_e_struct(u, sm), 0, 1)

        def halo_add(y):
            """Accumulate shared-plane contributions across each
            partitioned axis in sequence; the second exchange carries
            the first's edge sums, so diagonal-neighbor (corner)
            contributions arrive in two hops."""
            shp = y.shape
            y = y.reshape(shp[:-1] + latg_loc)
            for i, name in enumerate(names):
                Dk = self.mesh_shape[i]
                if Dk == 1:
                    continue
                ax = y.ndim - nlat + i
                L = latg_loc[i]
                up = [(j, j + 1) for j in range(Dk - 1)]
                down = [(j + 1, j) for j in range(Dk - 1)]
                last = jax.lax.slice_in_dim(y, L - 1, L, axis=ax)
                first = jax.lax.slice_in_dim(y, 0, 1, axis=ax)
                from_prev = jax.lax.ppermute(last, name, up)
                from_next = jax.lax.ppermute(first, name, down)
                pre = (slice(None),) * ax
                y = y.at[pre + (0,)].add(from_prev[pre + (0,)])
                y = y.at[pre + (L - 1,)].add(from_next[pre + (0,)])
            return y.reshape(shp)

        def assemble(u_e):
            return halo_add(structured.e_to_l_struct(u_e, sm))

        def pdot(u, v):
            return jax.lax.psum(
                jnp.sum(u * v * owned[None, :], axis=-1), names)

        def edot(u, v):
            return jax.lax.psum(jnp.sum(u * v, axis=-1), names)

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
            return sJit, jax.lax.pmin(dtm, names)

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
            # local form of Hydro._taylor_source (laghos_solver.cpp:455-465)
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

        if lat is not None:
            # whole-lattice per-block operators (ops/lattice.py): same
            # banded-matmul kernels as single-chip, same plane halos.
            # Redefining these names rebinds the closures captured by
            # solve_velocity/solve_energy above (late binding).
            from ..ops import lattice as lop

            ldims = self.lat_dims_loc
            edims = self.dims_loc

            def qupd(Sc):                                    # noqa: F811
                sJit9, dtm = lop.qupdate3d_lattice(
                    Sc["x"], Sc["v"], Sc["e"], lat, ldims, edims,
                    h.tables, h1order=float(opt.order_v), cfl=opt.cfl,
                    use_viscosity=h.use_visc,
                    use_vorticity=h.use_vort, h0=h.h0)
                return sJit9, jax.lax.pmin(dtm, names)

            def mass_apply(u):                               # noqa: F811
                y = lop.mass_apply_lattice(u, self.lat_TB, lat["Dq"],
                                           ldims)
                y = halo_add(y)
                return jnp.where(ess, 0.0, y)

            def force_rhs(sJit):                             # noqa: F811
                y = lop.force_one_lattice(
                    sJit, self.lat_TB, self.lat_TG).reshape(d, -1)
                y = halo_add(y)
                return jnp.where(jnp.abs(y) < h.ftz_eps2, 0.0, y)

            def force_T(sJit, v):                            # noqa: F811
                return lop.force_transpose_lattice(
                    v, sJit, lat, ldims, edims, h.tables)

            if self.lat_oz is not None:
                # f64-accurate production kernels: int8-MXU Ozaki
                # banded chains per block, identical to the conforming
                # Hydro's (ops/lattice_oz.py), with the SAME plane-halo
                # exchange — the chains are block-local so only the
                # assembled L-vector planes ride the ICI.
                from ..ops import lattice_oz as lzo
                from ..ops import pallas_df64 as pdf

                loz = self.lat_oz
                df64 = pdf.df64_mode(opt.df64_qphys)

                def qupd(Sc):                                # noqa: F811
                    sJit9, dtm = lop.qupdate3d_lattice(
                        Sc["x"], Sc["v"], Sc["e"], lat, ldims, edims,
                        h.tables, h1order=float(opt.order_v),
                        cfl=opt.cfl, use_viscosity=h.use_visc,
                        use_vorticity=h.use_vort, h0=h.h0, oz=loz,
                        df64=df64)
                    return sJit9, jax.lax.pmin(dtm, names)

                def mass_apply(u):                           # noqa: F811
                    y = lzo.mass_apply_lattice_oz(u, loz, lat["Dq"],
                                                  ldims)
                    y = halo_add(y)
                    return jnp.where(ess, 0.0, y)

                rhs_S = opt.ozaki_rhs_slices or None

                def force_rhs(sJit):                         # noqa: F811
                    y = lzo.force_one_lattice_oz(
                        sJit, loz, n_slices=rhs_S).reshape(d, -1)
                    y = halo_add(y)
                    return jnp.where(jnp.abs(y) < h.ftz_eps2, 0.0, y)

                def force_T(sJit, v):                        # noqa: F811
                    return lop.force_transpose_lattice(
                        v, sJit, lat, ldims, edims, h.tables, oz=loz,
                        oz_slices=rhs_S)

                if opt.cg_ir:
                    solve_ir = self._make_solve_ir(
                        loz, lat, ldims, halo_add, ess, dinv, owned,
                        names)

                    def solve_velocity(sJit, x0=None):       # noqa: F811
                        rhs = -force_rhs(sJit)
                        if rt is not None:
                            rhs = rhs + rt
                        rhs = jnp.where(ess, 0.0, rhs)
                        return solve_ir(rhs, x0=x0)

        return dict(qupd=qupd, solve_velocity=solve_velocity,
                    solve_energy=solve_energy, owned=owned, edot=edot)

    def _make_solve_ir(self, loz, lat, ldims, halo_add, ess, dinv, owned,
                       names):
        """Distributed mixed-precision IR velocity solve: the SPMD image
        of Hydro._cg_velocity_ir.  Inner Jacobi-CG sweeps on the f32
        shadow of the banded lattice operator (owned-dof psum dots, one
        plane halo per apply); outer residuals through the f64-accurate
        truncated-Ozaki apply; the outer stopping criterion is the
        globally psum-reduced preconditioned residual dot, so every
        device iterates in lockstep.  Uses the Jacobi preconditioner
        (the Kronecker inverse is not block-local across a partitioned
        axis)."""
        from ..ops import lattice as lop
        from ..ops import lattice_oz as lzo
        from ..solvers.cg import cg

        h = self.h
        opt = h.opt
        TB32 = self.lat_TB32
        Dq32 = lat["Dq"].astype(jnp.float32)
        dinv32 = dinv.astype(jnp.float32)[None, :]
        owned32 = owned.astype(jnp.float32)
        dinvb = dinv[None, :]
        tol = opt.cg_tol
        f64 = self.dtype

        def apply32(u):
            y = lop.mass_apply_lattice(u, TB32, Dq32, ldims)
            y = halo_add(y)
            return jnp.where(ess, 0.0, y)

        def pdot32(u, v):
            return jax.lax.psum(
                jnp.sum(u * v * owned32[None, :], axis=-1), names)

        def prec32(rr):
            return rr * dinv32

        # residual-apply slice count: identical derivation to
        # Hydro._cg_velocity_ir (Ozaki truncation ~a decade below the
        # residual target)
        s_res = min(8, max(4, int(np.ceil((-np.log2(tol) + 3.4) / 7.0))))
        # incremental-update slice count after the first outer (see
        # Hydro._cg_velocity_ir: the Ozaki split normalizes by the
        # operand's own exponents, so A dx at correction size keeps the
        # tracked residual below tol with one fewer slice; s_res-2 was
        # measured to under-converge shock rows — drift 2e-13 -> 1e-11)
        s_lo = max(3, s_res - 1)

        def apply_res(u, n_slices=None):
            y = lzo.mass_apply_lattice_oz(u, loz, lat["Dq"], ldims,
                                          n_slices=n_slices or s_res)
            y = halo_add(y)
            return jnp.where(ess, 0.0, y)

        def rdot(r):
            return jax.lax.psum(
                jnp.sum(r * r * dinvb * owned[None, :], axis=-1), names)

        inner_tol = opt.cg_ir_inner_tol
        inner_max = min(opt.cg_max_iter, 100)

        def solve_ir(rhs, x0=None):
            if x0 is None:
                x = jnp.zeros_like(rhs)
                r = rhs
            else:
                x = x0
                r = rhs - apply_res(x0)
            target = rdot(rhs) * (tol * tol)

            def cond(st):
                x, r, it, outers, active = st
                return jnp.logical_and(jnp.any(active), outers < 8)

            def body(st):
                x, r, it, outers, active = st
                with jax.default_matmul_precision(opt.cg_ir_inner_mxu):
                    res = cg(apply32, r.astype(jnp.float32), inner_tol,
                             inner_max, precond=prec32, dot=pdot32)
                dx = jnp.where(active[:, None], res.x.astype(f64), 0.0)
                x = x + dx
                # incremental residual: full slices while dx ~ x (first
                # outer), the cheaper s_lo split once dx is a correction
                r = r - jax.lax.cond(
                    outers == 0,
                    lambda u: apply_res(u),
                    lambda u: apply_res(u, n_slices=s_lo), dx)
                it = it + jnp.where(active, res.iters + 1, 0)
                active = jnp.logical_and(active, rdot(r) > target)
                return (x, r, it, outers + 1, active)

            active0 = rdot(r) > target
            it0 = jnp.zeros(rhs.shape[0], jnp.int32)
            x, r, it, outers, active = jax.lax.while_loop(
                cond, body, (x, r, it0, jnp.asarray(0), active0))
            return x, jnp.sum(it)

        return solve_ir

    # ------------------------------------------------------------------
    def _make_advance(self, count_stage1: bool, with_sj: bool):
        h = self.h
        consts = self._consts()
        names = self.names
        sp = self._spec

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
            # global finite guard (Hydro._guard_finite, psum-reduced)
            loc = (jnp.sum(S_new["v"]) + jnp.sum(S_new["e"])
                   + jnp.sum(S_new["x"]))
            ok = jnp.isfinite(jax.lax.psum(loc, names))
            dt_est = jnp.where(ok, dt_est, 0.0)
            S_out = {k: v[None] for k, v in S_new.items()}
            sj_out = (tuple(a[None] for a in sj_new)
                      if isinstance(sj_new, tuple) else sj_new[None])
            return S_out, dt_est, stats, sj_out

        n_c = len(consts)
        if with_sj:
            entry = prog
            in_specs = (sp, P(), sp) + (sp,) * n_c
        else:
            def entry(S, dtv, *cc):
                return prog(S, dtv, None, *cc)
            in_specs = (sp, P()) + (sp,) * n_c
        smapped = shard_map(entry, mesh=self.mesh, in_specs=in_specs,
                            out_specs=(sp, P(), P(), sp),
                            check_vma=False)
        if with_sj:
            return jax.jit(smapped, donate_argnums=(2,))
        return jax.jit(smapped)

    # ---------------------------- driver API ---------------------------
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
            sp = self._spec

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
                in_specs=(sp,) + (sp,) * n_c,
                out_specs=(P(), sp), check_vma=False))
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
            names = self.names
            sp = self._spec

            def prog(S, rw):
                from ..ops import tensor as top

                Sl = {k: v[0] for k, v in S.items()}
                rwl = rw[0]
                ne_loc = Sl["e"].shape[0]
                et = Sl["e"].reshape((ne_loc,) + (h.l1d,) * d)
                e_q = top.eval_values(et, h.tables["L2B"], d).reshape(
                    ne_loc, h.NQ)
                ie = jax.lax.psum(jnp.sum(rwl * e_q), names)
                v_e = jnp.swapaxes(
                    structured.l_to_e_struct(Sl["v"], self.sm_loc), 0, 1)
                vt = v_e.reshape((ne_loc, d) + (h.nd1,) * d)
                v_q = top.eval_values(vt, h.tables["H1B"], d).reshape(
                    ne_loc, d, h.NQ)
                ke = jax.lax.psum(
                    0.5 * jnp.sum(rwl * jnp.sum(v_q**2, axis=1)), names)
                return ie, ke

            self._energies = jax.jit(shard_map(
                prog, mesh=self.mesh, in_specs=(sp, sp),
                out_specs=(P(), P()), check_vma=False))
        return self._energies(S, self.rw_l)

    def e_norm(self, S):
        e = np.asarray(S["e"])
        return float(np.sqrt((e ** 2).sum()))

    def to_global(self, S):
        """Local (Dt, ...) state -> global (conforming Hydro layout)."""
        d = self.h.dim
        x = np.zeros((d,) + self.latg)
        v = np.zeros_like(x)
        for t, tile in enumerate(self._dev_tiles):
            sl = (slice(None),) + self._dof_slices(tile)
            x[sl] = np.asarray(S["x"][t]).reshape((d,) + self.latg_loc)
            v[sl] = np.asarray(S["v"][t]).reshape((d,) + self.latg_loc)
        e = np.zeros(self.grid + (self.h.ld,))
        for t, tile in enumerate(self._dev_tiles):
            sl = []
            for i, k in enumerate(tile):
                n = self.grid_loc[i]
                sl.append(slice(k * n, (k + 1) * n))
            e[tuple(sl)] = np.asarray(S["e"][t]).reshape(
                self.grid_loc + (self.h.ld,))
        return {"x": x.reshape(d, -1), "v": v.reshape(d, -1),
                "e": e.reshape(self.NE, self.h.ld)}
