"""Sub-phase profile of the ns2 bench row (rs4 Q2-Q1 ozaki+IR).

Times each component of the three FOM phases with amortized on-device
fori loops (bench.py methodology) so the ~25 ms axon dispatch cost
vanishes.  Run on the TPU:  python scripts/prof_ns2.py
Optionally PROF_ROW=ns4, PROF_ITERS=30.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from laghos_tpu import driver  # noqa: E402
from laghos_tpu.fem import mesh as fmesh  # noqa: E402
from laghos_tpu.hydro import Hydro, Options  # noqa: E402
from laghos_tpu.ops import lattice as lop  # noqa: E402
from laghos_tpu.ops import lattice_oz as lzo  # noqa: E402
from laghos_tpu.ops import omm  # noqa: E402
from laghos_tpu.ops import qphys  # noqa: E402

ROW = os.environ.get("PROF_ROW", "ns2")
CFG = {"ns2": dict(rs=4, ok=2, ot=1), "ns4": dict(rs=3, ok=4, ot=3)}[ROW]
ITERS = int(os.environ.get("PROF_ITERS", "30"))
EPS = 1e-300


def timed(name, fn, args, h, iters=ITERS, extra=None):
    """fn(state) -> state, or fn(state, extra) -> state when `extra`
    (a pytree of large device arrays) is given — threaded as jit
    ARGUMENTS so they never become embedded HLO constants (the remote
    compiler rejects multi-MB modules with HTTP 413)."""
    def prog(ctx, a, ex):
        with h._bind_ctx(ctx):
            body = (lambda i, s: fn(s)) if ex is None else \
                (lambda i, s: fn(s, ex))
            return jax.lax.fori_loop(0, iters, body, a)

    jf = jax.jit(prog)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(h._ctx(), args, extra))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(h._ctx(), args, extra))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[1] / iters * 1e3
    print(f"{name:38s} {ms:9.3f} ms/call   (compile+warm {tc:.1f}s)",
          flush=True)
    return ms


def main():
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(CFG["rs"]):
        m = fmesh.uniform_refine(m)
    opt = Options(problem=1, blast_energy=2.0, ode_solver=7,
                  order_v=CFG["ok"], order_e=CFG["ot"], cg_tol=1e-11,
                  ozaki=True, precond="jacobi")
    h = Hydro(m, opt, dtype=jnp.float64)
    res = driver.run(h, t_final=0.6, max_steps=12, vis_steps=1000,
                     verbose=False)
    S = res.S
    print(f"row {ROW}: NE={h.NE} lat_dims={h._lat_dims} "
          f"nq1={h.nq1} steps_sampled={res.steps}", flush=True)

    loz = h._lat_oz
    ld = h._lat_dims

    x3 = S["x"].reshape((3,) + ld)
    v3 = S["v"].reshape((3,) + ld)
    xv6 = jnp.concatenate([x3, v3], axis=0)
    sJ, _ = jax.block_until_ready(h._jq(S))
    B = jax.block_until_ready(h._jprep_v(h._jforce1(sJ)))

    def red(t):
        if isinstance(t, tuple):
            return sum(jnp.sum(a) for a in t)
        return jnp.sum(t)

    # ---- qupdate components ------------------------------------------
    t_q = timed("qupdate total", lambda s: {
        "x": s["x"] + EPS * h._qupdate(s)[1], "v": s["v"], "e": s["e"]},
        S, h)

    t_split = timed("split_dyn S=6 (6,Lz,Ly,Lx)",
                    lambda a: a + EPS * red(omm.split_dyn(a, 6, axis=1).cat.astype(jnp.float64)),
                    xv6, h)

    t_g18 = timed("grad18 (x,v) oz chains",
                  lambda a: a + EPS * red(lzo.grad18_lattice_oz(
                      a[:3], a[3:], loz)[0]),
                  xv6, h)

    t_l2e = timed("l2_eval_oz (S=8)",
                  lambda e: e + EPS * red(lzo.l2_eval_oz(e, loz)),
                  S["e"], h)

    # physics on fixed gradients
    J9, dV9 = jax.block_until_ready(
        jax.jit(lambda a: lzo.grad18_lattice_oz(a[:3], a[3:], loz))(xv6))
    e_q = jax.block_until_ready(jax.jit(lambda e: lop.eq_to_qlattice(
        lzo.l2_eval_oz(e, loz), h._edims, h.nq1))(S["e"]))

    def phys(eq, ex):
        J9x, dV9x = ex
        lat = h._lat
        sj, dtq, _ = qphys.physics_3d(
            J9x, dV9x, lat["J0i9"], eq, lat["rw"], lat["gam"],
            lat["winv"], h0_e=lat["h0e"], h1order=float(h.opt.order_v),
            cfl=h.opt.cfl, use_viscosity=h.use_visc,
            use_vorticity=h.use_vort)
        return eq + EPS * (red(sj) + jnp.sum(dtq))

    t_phys = timed("physics_3d pointwise (f64)", phys, e_q, h,
                   extra=(J9, dV9))

    # ---- force pair components ---------------------------------------
    def f_one(sj):
        bump = EPS * red(lzo.force_one_lattice_oz(sj, loz))
        return tuple(a + bump for a in sj)

    t_f1 = timed("force_one oz (9 chains)", f_one, sJ, h)
    t_g9 = timed("grad9(v) oz",
                 lambda a: a + EPS * red(lzo.gradc_lattice_oz(a, loz)),
                 v3, h)

    def ftrans(v, sj):
        er = lop.force_transpose_lattice(
            v.reshape(3, -1), sj, h._lat, ld, h._edims, h.tables,
            oz=loz)
        return v + EPS * jnp.sum(er)

    t_ft = timed("force_transpose total", ftrans, v3, h, extra=sJ)

    # ---- cg components -------------------------------------------------
    t_cg = timed("cg_velocity_ir total",
                 lambda b: b + EPS * red(h._cg_velocity(b)[0]),
                 B, h, iters=max(4, ITERS // 3))

    Ts32, Dq32 = h._lat32["Ts"], h._lat32["Dq"]
    ess = h.ess_mask_j

    def apply32(b):
        with jax.default_matmul_precision(h.opt.cg_ir_inner_mxu):
            y = lop.mass_apply_lattice(b.astype(jnp.float32), Ts32, Dq32,
                                       ld)
        return b + EPS * jnp.sum(jnp.where(ess, 0.0, y)).astype(b.dtype)

    t_a32 = timed("inner apply32 (bf16)", apply32, B, h)

    def apply_oz(b):
        y = lzo.mass_apply_lattice_oz(b, loz, h._lat["Dq"], ld,
                                      n_slices=6)
        return b + EPS * jnp.sum(jnp.where(ess, 0.0, y))

    t_aoz = timed("outer ozaki apply (S=6)", apply_oz, B, h)

    def inner_cg(b):
        from laghos_tpu.solvers.cg import cg
        dinv32 = h.h1_dinv[None, :].astype(jnp.float32)

        def ap(u):
            y = lop.mass_apply_lattice(u, Ts32, Dq32, ld)
            return jnp.where(ess, 0.0, y)

        with jax.default_matmul_precision(h.opt.cg_ir_inner_mxu):
            res = cg(ap, b.astype(jnp.float32), h.opt.cg_ir_inner_tol,
                     min(h.opt.cg_max_iter, 100),
                     precond=lambda r: r * dinv32)
        return b + EPS * jnp.sum(res.x).astype(b.dtype), res.iters

    it_holder = {}

    def inner_cg_state(b):
        nb, it = inner_cg(b)
        return nb + EPS * jnp.sum(it).astype(b.dtype)

    t_icg = timed("one inner f32 cg (to inner_tol)", inner_cg_state, B, h,
                  iters=max(4, ITERS // 3))

    print("\nsummary (ms):")
    print(f"  qupdate {t_q:.2f} = grad18 {t_g18:.2f} + l2eval {t_l2e:.2f}"
          f" + phys {t_phys:.2f} (+rearrange)")
    print(f"  force   {t_f1 + t_ft:.2f} = f1 {t_f1:.2f} + fT {t_ft:.2f}"
          f" (grad9v {t_g9:.2f} inside fT)")
    print(f"  cg {t_cg:.2f}; inner-cg-call {t_icg:.2f},"
          f" apply32 {t_a32:.2f}, ozaki-apply {t_aoz:.2f},"
          f" split6 {t_split:.2f}")


if __name__ == "__main__":
    main()
