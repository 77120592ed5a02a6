"""Measure the fused df64 Pallas qupdate physics vs XLA emulated-f64
at the ns2 bench point (rs4 Q2-Q1, 2.1M qpoints) on the real chip.

Usage: python scripts/prof_df64.py [rs] [ok]
Honors CHK_PLATFORM=cpu for a CPU sanity run.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

if os.environ.get("CHK_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CHK_PLATFORM"])
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laghos_tpu import driver                              # noqa: E402
from laghos_tpu.fem import mesh as fmesh                   # noqa: E402
from laghos_tpu.hydro import Hydro, Options                # noqa: E402


def timed(name, fn, *args, n=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    warm = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = jax.block_until_ready(fn(*args))
        ts.append((time.time() - t0) / n)
    print(f"{name:48s} {sorted(ts)[1]*1e3:8.3f} ms/call   "
          f"(compile+warm {warm:.1f}s)", flush=True)
    return out


def main():
    rs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ok = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=4,
                         order_v=ok, order_e=ok - 1, cg_tol=1e-8,
                         precond="jacobi", ozaki=True))
    print(f"NE={h.NE} lat_dims={h._lat_dims} nq1={h.nq1}", flush=True)
    res = driver.run(h, t_final=0.6, max_steps=3, verbose=False)
    S = res.S

    from laghos_tpu.ops import lattice as lop

    args = (S["x"], S["v"], S["e"], h._lat, h._lat_dims, h._edims,
            h.tables)
    kw = dict(h1order=float(h.opt.order_v), cfl=h.opt.cfl,
              use_viscosity=True, use_vorticity=False, h0=h.h0,
              oz=h._lat_oz)

    qf = jax.jit(lambda x, v, e: lop.qupdate3d_lattice(
        x, v, e, *args[3:], **kw))
    qd = jax.jit(lambda x, v, e: lop.qupdate3d_lattice(
        x, v, e, *args[3:], **kw, df64={"interpret": False}))

    sJ_f, dt_f = timed("qupdate oz (f64 physics)", qf, *args[:3])
    sJ_d, dt_d = timed("qupdate oz (df64 pallas)", qd, *args[:3])
    for bm in (64, 128, 256):
        qb = jax.jit(lambda x, v, e, bm=bm: lop.qupdate3d_lattice(
            x, v, e, *args[3:], **{**kw},
            df64={"interpret": False, "bm": bm}))
        try:
            timed(f"qupdate oz (df64 pallas bm={bm})", qb, *args[:3])
        except Exception as ex:  # noqa: BLE001
            print(f"bm={bm}: {type(ex).__name__}: {str(ex)[:120]}")

    import numpy as np

    for k in range(9):
        scale = float(jnp.max(jnp.abs(sJ_f[k]))) + 1e-300
        rel = float(jnp.max(jnp.abs(sJ_d[k] - sJ_f[k]))) / scale
        print(f"sJit[{k}] rel {rel:.2e}")
    print(f"dt f64 {float(dt_f):.15e}")
    print(f"dt df64 {float(dt_d):.15e} "
          f"rel {abs(float(dt_d - dt_f))/float(dt_f):.2e}")
    print("rc=0")


if __name__ == "__main__":
    main()
