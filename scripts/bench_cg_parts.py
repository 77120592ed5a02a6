"""Decompose the velocity-CG iteration cost on TPU.

The CG solve is ~2/3 of step time (22 ms/solve at rs4 f32, ~1 ms/iter)
while its speed-of-light HBM traffic is ~30 us/iter.  This times each
piece with amortized on-device loops to locate the gap:
  - full mass apply (L -> E -> chain -> L)
  - E<->L structured transforms alone
  - per-element contraction chain alone
  - CG dots/axpys alone
  - the full cg() solve for reference
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.ops import mass as mop


def timed(fn, args, iters=300):
    f = jax.jit(lambda a: jax.lax.fori_loop(0, iters, lambda i, s: fn(s), a))
    jax.block_until_ready(f(args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / iters


def main():
    rs = int(os.environ.get("BENCH_RS", "4"))
    dts = os.environ.get("BENCH_DTYPE", "f32")
    dtype = jnp.float64 if dts == "f64" else jnp.float32
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0,
                         cg_tol=2e-7 if dts == "f32" else 1e-8),
              dtype=dtype)
    d = 3
    u = jnp.ones((d, h.ndof), dtype)
    eps = dtype(1e-30 if dts == "f32" else 1e-300)

    def full_apply(x):
        # the PRODUCTION operator CG applies (struct transforms + chain)
        y = h._h1_apply_bc(x)
        return x + eps * y

    t_apply = timed(full_apply, u)

    # E<->L alone: struct gather then struct scatter (no chain)
    def transforms_only(x):
        ue = h._gather_e(x)
        y = h._assemble(jnp.swapaxes(ue, 0, 1))
        return x + eps * y

    t_ltl = timed(transforms_only, u)

    # dots/axpys alone (CG skeleton without the operator)
    def skeleton(x):
        r = x
        nom = jnp.sum(r * r)
        alpha = nom / (nom + 1.0)
        return x + alpha * eps * r

    t_skel = timed(skeleton, u)

    B = jnp.ones((1, d * h.ndof), dtype)

    def cg_solve(b):
        x, it = h._cg_velocity(b.reshape(d, -1))
        return b + eps * x.reshape(1, -1)

    t_cg = timed(cg_solve, B, iters=20)

    print(f"rs{rs} {dts}: ndof={h.ndof} NE={h.NE}")
    print(f"mass apply production:  {t_apply*1e3:8.3f} ms")
    print(f"transforms only (L->L): {t_ltl*1e3:8.3f} ms")
    print(f"dots/axpy skeleton:     {t_skel*1e3:8.3f} ms")
    print(f"full cg solve:          {t_cg*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
