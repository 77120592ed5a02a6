"""Micro-benchmark: H1 mass apply with scatter-add vs incidence-gather
assembly (TPU), at bench sizes."""

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

rs = int(os.environ.get("BENCH_RS", "4"))
dtype = jnp.float32
m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
for _ in range(rs):
    m = fmesh.uniform_refine(m)
h = Hydro(m, Options(problem=1, blast_energy=2.0), dtype=dtype)
print(f"NE={h.NE} ndof={h.ndof}")

u = jnp.asarray(np.random.default_rng(0).normal(size=(3, h.ndof)),
                dtype)

def run(fn, name, iters=50):
    f = jax.jit(lambda u: jax.lax.fori_loop(
        0, iters, lambda i, s: fn(s) * (1.0 - 1e-30) , u))
    jax.block_until_ready(f(u))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(u))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[1] / iters * 1e3:.3f} ms/apply")

def apply_scatter(v):
    ue = mop.l_to_e(v, h.gather)
    ue = mop.mass_apply_e(ue, h.massD, h.tables["H1B"], 3)
    return mop.e_to_l(ue, h.gather, h.ndof)

inc, msk = mop.build_incidence(h.h1.gather, h.ndof)
inc = jnp.asarray(inc); msk = jnp.asarray(msk, dtype)

def apply_gather(v):
    ue = mop.l_to_e(v, h.gather)
    ue = mop.mass_apply_e(ue, h.massD, h.tables["H1B"], 3)
    return mop.e_to_l_gather(ue, inc, msk)

def elem_only(v):
    ue = mop.l_to_e(v, h.gather)
    ue = mop.mass_apply_e(ue, h.massD, h.tables["H1B"], 3)
    return v + 1e-30 * jnp.sum(ue)

run(elem_only, "gather+element-mass only")
run(apply_scatter, "scatter-add assembly")
run(apply_gather, "incidence-gather assembly")

from laghos_tpu.ops.structured import detect_structure, l_to_e_struct, e_to_l_struct
sm = h._sm or detect_structure(m, h.h1.gather, h.opt.order_v)
def apply_struct(v):
    ue = l_to_e_struct(v, sm)              # (3, NE, nd)
    ue = mop.mass_apply_e(ue, h.massD, h.tables["H1B"], 3)
    return e_to_l_struct(ue, sm)
run(apply_struct, "structured parity assembly")
