"""Decompose the ns2 IR velocity-solve (T1) and force (T2) costs on the
real chip, and A/B the cyclic-contraction lattice mass apply against the
current moveaxis form.

T1 anatomy (per solve, ns2 r4: 46.6 ms at 106.7 applies):
  ~104 inner f32 sweeps (bf16 MXU lattice mass applies) + ~3 Ozaki
  residual applies (s_res=6 first outer, s_lo=4 after).  FOM1 =
  dofs*applies/T1, so the lever is per-apply time, not apply count.

Usage: python scripts/prof_ir.py [rs] [ok]   (CHK_PLATFORM=cpu to sanity-run)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

if os.environ.get("CHK_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CHK_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laghos_tpu import driver                              # noqa: E402
from laghos_tpu.fem import mesh as fmesh                   # noqa: E402
from laghos_tpu.hydro import Hydro, Options                # noqa: E402


def timed(name, fn, args, iters=100, unroll=False):
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, iters, lambda i, s: fn(s), a))
    t0 = time.time()
    out = jax.block_until_ready(f(args))
    warm = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(args))
        ts.append((time.time() - t0) / iters)
    print(f"{name:44s} {sorted(ts)[1]*1e3:8.3f} ms   "
          f"(compile {warm:.0f}s)", flush=True)
    return out


def main():
    rs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ok = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=7,
                         order_v=ok, order_e=ok - 1, cg_tol=1e-11,
                         precond="jacobi", ozaki=True))
    print(f"NE={h.NE} lat_dims={h._lat_dims} ndof={h.ndof}", flush=True)
    res = driver.run(h, t_final=0.6, max_steps=3, verbose=False)
    S = res.S

    from laghos_tpu.ops import lattice as lop
    from laghos_tpu.ops import lattice_oz as lzo

    dims = h._lat_dims
    Ts32 = h._lat32["Ts"]
    Dq32 = h._lat32["Dq"]
    ess = h.ess_mask_j
    u32 = S["v"].astype(jnp.float32)
    eps32 = jnp.float32(1e-20)

    # --- inner f32 sweep apply: current form, bf16 + 3-pass ---
    def ap_cur(u):
        with jax.default_matmul_precision("bfloat16"):
            y = lop.mass_apply_lattice(u, Ts32, Dq32, dims)
        return u + eps32 * jnp.where(ess, 0.0, y)

    timed("inner apply f32/bf16 (current)", ap_cur, u32)

    # --- cyclic-contraction variant (no moveaxis) ---
    def mass_cyc(uL, Ts, Dq, lat_dims):
        C = uL.shape[0]
        q = uL.reshape((C,) + tuple(lat_dims))
        for k in range(3):
            q = jnp.tensordot(q, Ts[k], axes=[[1], [0]])
        q = q * Dq[None]
        for k in range(3):
            q = jnp.tensordot(q, Ts[k], axes=[[1], [1]])
        return q.reshape(C, -1)

    def ap_cyc(u):
        with jax.default_matmul_precision("bfloat16"):
            y = mass_cyc(u, Ts32, Dq32, dims)
        return u + eps32 * jnp.where(ess, 0.0, y)

    y_cur = ap_cur(u32)
    y_cyc = ap_cyc(u32)
    rel = float(jnp.max(jnp.abs(y_cyc - y_cur))
                / (float(jnp.max(jnp.abs(y_cur))) + 1e-30))
    timed("inner apply f32/bf16 (cyclic)", ap_cyc, u32)
    print(f"   cyclic-vs-current rel {rel:.2e}")

    # --- jacobi precond + CG skeleton overhead ---
    dinv32 = h.h1_dinv[None, :].astype(jnp.float32)

    def skel(u):
        z = u * dinv32
        nom = jnp.sum(z * u, axis=-1)
        return u + (eps32 * nom)[:, None] * z

    timed("CG skeleton (prec+dots+axpy)", skel, u32)

    # --- ozaki residual applies at s_res / s_lo ---
    u64 = S["v"]
    eps64 = 1e-200

    for sl in (8, 6, 5, 4):
        def ap_oz(u, sl=sl):
            y = lzo.mass_apply_lattice_oz(u, h._lat_oz, h._lat["Dq"],
                                          dims, n_slices=sl)
            return u + eps64 * jnp.where(ess, 0.0, y)

        timed(f"ozaki residual apply S={sl}", ap_oz, u64, iters=30)

    # --- f64 plain lattice apply (XLA emulated) for scale ---
    def ap64(u):
        y = lop.mass_apply_lattice(u, h._lat["Ts"], h._lat["Dq"], dims)
        return u + eps64 * jnp.where(ess, 0.0, y)

    timed("plain f64 lattice apply (emul)", ap64, u64, iters=30)

    # --- the full IR solve ---
    sJit, _ = jax.block_until_ready(h._jq(S))
    B = jax.block_until_ready(h._jprep_v(h._jforce1(sJit)))

    def cg_body(b):
        x, it = h._cg_velocity(b)
        return b + eps64 * x

    timed("full IR velocity solve", cg_body, B, iters=10)
    x, it = jax.jit(h._cg_velocity)(B)
    print(f"   applies/solve: {float(jnp.sum(it))/3.0:.1f}")

    # --- force pair at S=8 (current) ---
    def fpair(sj):
        raw = h._force_rhs_raw(sj)
        e_rhs = h._force_transpose(sj, S["v"])
        bump = eps64 * (jnp.sum(raw) + jnp.sum(e_rhs))
        return tuple(a + bump for a in sj)

    timed("force pair (one + transpose) S=8", fpair, sJit, iters=30)
    print("rc=0")


if __name__ == "__main__":
    main()
