"""Fine-grained attribution of the ns2 hot blocks (physics_3d 29.8 ms,
force_transpose 44 ms — scripts/prof_ns2.py summary).

Times (a) emulated-f64 VPU op micro-costs at the ns2 q-lattice size,
(b) physics_3d sub-blocks, (c) force_transpose sub-stages, so the
optimization targets the measured cost, not the guessed one.

Run on the TPU:  python scripts/prof_phys.py   (PROF_ITERS=30)
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
from laghos_tpu.ops import smallmat  # noqa: E402

ITERS = int(os.environ.get("PROF_ITERS", "30"))
EPS = 1e-300


def timed(name, fn, args, extra=None, iters=ITERS):
    def prog(a, ex):
        body = (lambda i, s: fn(s)) if ex is None else \
            (lambda i, s: fn(s, ex))
        return jax.lax.fori_loop(0, iters, body, a)

    jf = jax.jit(prog)
    t0 = time.perf_counter()
    jax.block_until_ready(jf(args, extra))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(args, extra))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[1] / iters * 1e3
    print(f"{name:44s} {ms:9.3f} ms/call   (compile+warm {tc:.1f}s)",
          flush=True)
    return ms


def main():
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(4):
        m = fmesh.uniform_refine(m)
    opt = Options(problem=1, blast_energy=2.0, ode_solver=7,
                  order_v=2, order_e=1, cg_tol=1e-11,
                  ozaki=True, precond="jacobi")
    h = Hydro(m, opt, dtype=jnp.float64)
    res = driver.run(h, t_final=0.6, max_steps=12, vis_steps=1000,
                     verbose=False)
    S = res.S
    print(f"NE={h.NE} lat_dims={h._lat_dims} nq1={h.nq1}", flush=True)

    loz = h._lat_oz
    ld = h._lat_dims
    lat = h._lat
    x3 = S["x"].reshape((3,) + ld)
    v3 = S["v"].reshape((3,) + ld)
    xv6 = jnp.concatenate([x3, v3], axis=0)
    J9, dV9 = jax.block_until_ready(
        jax.jit(lambda a: lzo.grad18_lattice_oz(a[:3], a[3:], loz))(xv6))
    e_q = jax.block_until_ready(jax.jit(lambda e: lop.eq_to_qlattice(
        lzo.l2_eval_oz(e, loz), h._edims, h.nq1))(S["e"]))
    sJ, _ = jax.block_until_ready(h._jq(S))

    def red(t):
        if isinstance(t, tuple):
            return sum(jnp.sum(a) for a in t)
        return jnp.sum(t)

    # ---- (a) emulated-f64 micro op costs at q-lattice size ----------
    q64 = e_q
    q32 = e_q.astype(jnp.float32)
    N_OPS = 20

    def chain(op):
        def f(x):
            y = x
            for _ in range(N_OPS):
                y = op(y)
            return x + EPS * jnp.sum(y)
        return f

    for nm, x0, op in (
        ("f64 mul x20", q64, lambda y: y * 1.0000001),
        ("f32 mul x20", q32, lambda y: y * jnp.float32(1.0000001)),
        ("f64 add x20", q64, lambda y: y + 1.0e-9),
        ("f64 div x20", q64, lambda y: y / (y + 1.125)),
        ("f32 div x20", q32, lambda y: y / (y + jnp.float32(1.125))),
        ("f64 sqrt x20", q64, lambda y: jnp.sqrt(jnp.abs(y) + 1.0)),
        ("f32 sqrt x20", q32,
         lambda y: jnp.sqrt(jnp.abs(y) + jnp.float32(1.0))),
        ("f64 rsqrt x20", q64,
         lambda y: jax.lax.rsqrt(jnp.abs(y) + 1.0)),
        ("f64 where/cmp x20", q64,
         lambda y: jnp.where(y > 0.5, y * 0.999, y + 1e-9)),
    ):
        timed(nm, chain(op), x0)

    # ---- (b) physics_3d sub-blocks -----------------------------------
    kw = dict(h0_e=lat["h0e"], h1order=float(h.opt.order_v),
              cfl=h.opt.cfl)

    def phys_full(eq, ex):
        J9x, dV9x = ex
        sj, dtq, _ = qphys.physics_3d(
            J9x, dV9x, lat["J0i9"], eq, lat["rw"], lat["gam"],
            lat["winv"], use_viscosity=True, use_vorticity=False, **kw)
        return eq + EPS * (red(sj) + jnp.sum(dtq))

    timed("physics_3d full", phys_full, e_q, extra=(J9, dV9))

    def phys_novisc(eq, ex):
        J9x, dV9x = ex
        sj, dtq, _ = qphys.physics_3d(
            J9x, dV9x, lat["J0i9"], eq, lat["rw"], lat["gam"],
            lat["winv"], use_viscosity=False, use_vorticity=False, **kw)
        return eq + EPS * (red(sj) + jnp.sum(dtq))

    timed("physics_3d no-visc (pre+finish)", phys_novisc, e_q,
          extra=(J9, dV9))

    # strain-rate components for isolated eig timing
    s6 = jax.block_until_ready(jax.jit(lambda ex: (
        ex[0][0], ex[0][4], ex[0][8],
        0.5 * (ex[0][1] + ex[0][3]),
        0.5 * (ex[0][2] + ex[0][6]),
        0.5 * (ex[0][5] + ex[0][7])))((dV9,)))

    def eig_vec(eq, ex):
        mu, (ax, ay, az) = smallmat.eig3s_hybrid(*ex, sweeps=4)
        return eq + EPS * (jnp.sum(mu) + jnp.sum(ax) + jnp.sum(ay)
                           + jnp.sum(az))

    timed("eig3s_hybrid want_vector", eig_vec, e_q, extra=s6)

    def eig_val(eq, ex):
        mu, _ = smallmat.eig3s_hybrid(*ex, sweeps=4, want_vector=False)
        return eq + EPS * jnp.sum(mu)

    timed("eig3s_hybrid values-only", eig_val, e_q, extra=s6)

    def eig_vec_s2(eq, ex):
        mu, (ax, ay, az) = smallmat.eig3s_hybrid(*ex, sweeps=2)
        return eq + EPS * (jnp.sum(mu) + jnp.sum(ax) + jnp.sum(ay)
                           + jnp.sum(az))

    timed("eig3s_hybrid want_vector sweeps=2", eig_vec_s2, e_q, extra=s6)

    # ---- (c) force_transpose sub-stages -------------------------------
    def ft_grad9(v):
        return v + EPS * red(lzo.gradc_lattice_oz(v, loz))

    timed("fT: grad9(v) oz S=8", ft_grad9, v3)

    def ft_grad9_s6(v):
        return v + EPS * red(lzo.gradc_lattice_oz(v, loz, n_slices=6))

    timed("fT: grad9(v) oz S=6", ft_grad9_s6, v3)

    def ft_pointwise(v, ex):
        dV9x, sJx = ex
        eq = None
        for gd in range(3):
            for vd in range(3):
                term = dV9x[vd * 3 + gd] * sJx[gd * 3 + vd]
                eq = term if eq is None else eq + term
        return v + EPS * jnp.sum(eq)

    timed("fT: pointwise 9-dot (f64)", ft_pointwise, v3, extra=(dV9, sJ))

    eqc = jax.block_until_ready(jax.jit(
        lambda dv, sj: sum(dv[vd * 3 + gd] * sj[gd * 3 + vd]
                           for gd in range(3) for vd in range(3)))(
        dV9, sJ))

    def ft_rearrange(x):
        eq = lop.qlattice_to_eq(x, h._edims, h.nq1)
        return x + EPS * jnp.sum(eq)

    timed("fT: qlattice_to_eq", ft_rearrange, eqc)

    eq_e = jax.block_until_ready(jax.jit(
        lambda x: lop.qlattice_to_eq(x, h._edims, h.nq1))(eqc))

    def ft_split(x):
        return x + EPS * jnp.sum(
            omm.split_dyn(x, 8).cat.astype(jnp.float64))

    timed("fT: split_dyn(eq) S=8", ft_split, eq_e)

    def ft_l2t(x):
        return x + EPS * jnp.sum(lzo.l2_transpose_oz(x, loz))

    timed("fT: l2_transpose_oz S=8", ft_l2t, eq_e)

    def ft_full(v, ex):
        er = lop.force_transpose_lattice(
            v.reshape(3, -1), ex, lat, ld, h._edims, h.tables, oz=loz)
        return v + EPS * jnp.sum(er)

    timed("fT: full force_transpose", ft_full, v3, extra=sJ)

    # ---- force_one sub-stages ----------------------------------------
    def f1_full(sj):
        return tuple(a + EPS * red(lzo.force_one_lattice_oz(sj, loz))
                     for a in sj)

    timed("f1: full force_one S=8", f1_full, sJ)


if __name__ == "__main__":
    main()
