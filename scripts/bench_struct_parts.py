"""Granular timing of the structured-assembly CG apply pieces (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", os.environ.get("CHK_PLATFORM", "axon"))
import jax.numpy as jnp
import numpy as np

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.ops import mass as mop
from laghos_tpu.ops.structured import l_to_e_struct, e_to_l_struct

rs = int(os.environ.get("BENCH_RS", "4"))
dtype = jnp.float32
m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
for _ in range(rs):
    m = fmesh.uniform_refine(m)
h = Hydro(m, Options(problem=1, blast_energy=2.0), dtype=dtype)
sm = h._sm
print(f"NE={h.NE} ndof={h.ndof}")

rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(3, h.ndof)), dtype)
ue = jnp.asarray(rng.normal(size=(3, h.NE, (h.nd1) ** 3)), dtype)


def run(fn, arg, name, iters=100):
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, iters, lambda i, s: fn(s) * (1.0 - 1e-30), arg if False else a))
    jax.block_until_ready(f(arg))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[1] / iters * 1e3:.3f} ms")


perm = jnp.asarray(sm.perm)
inv = jnp.asarray(sm.inv)
eps = 1e-30
run(lambda v: v[..., perm], u, "perm gather only (3, ndof)")
run(lambda v: v + eps * jnp.sum(l_to_e_struct(v, sm)),
    u, "l_to_e_struct (windows+perm)")
run(lambda v: mop.mass_apply_e(v, h.massD, h.tables["H1B"], 3),
    ue, "element mass apply only")
run(lambda v: v + eps * jnp.sum(e_to_l_struct(v, sm)),
    ue, "e_to_l_struct (windows_t+perm)")


def full(v):
    w = l_to_e_struct(v, sm)
    w = mop.mass_apply_e(w, h.massD, h.tables["H1B"], 3)
    return e_to_l_struct(w, sm)


run(full, u, "full mass apply (struct)")
