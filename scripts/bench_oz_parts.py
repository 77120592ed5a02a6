"""Phase-internal microbenchmarks of the Ozaki-lattice f64 pipeline.

Times the pieces of each hot phase (split_dyn / int8 dots /
reconstruction / physics chain) at rs4 Q2-Q1 scale to direct
optimization.  Run on the TPU: python scripts/bench_oz_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=30):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def main():
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options
    from laghos_tpu.ops import lattice_oz as lzo, omm

    print("devices:", jax.devices())
    rs = int(os.environ.get("RS", "4"))
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    h = Hydro(m, Options(problem=1, blast_energy=2.0, ode_solver=7,
                         order_v=2, order_e=1, ozaki=True, cg_tol=1e-8),
              dtype=jnp.float64)
    loz = h._lat_oz
    dims = h._lat_dims
    rng = np.random.default_rng(0)
    u3 = jnp.asarray(rng.normal(size=(3,) + tuple(dims)))
    u6 = jnp.asarray(rng.normal(size=(6,) + tuple(dims)))

    t = timeit(lambda a: omm.split_dyn(a, 8, axis=1).slices[0], u3)
    print(f"split_dyn (3,{dims[0]}^3) S=8: {t*1e3:.3f} ms")
    t = timeit(lambda a: omm.split_dyn(a, 7, axis=1).slices[0], u3)
    print(f"split_dyn S=7:               {t*1e3:.3f} ms")

    du = omm.split_dyn(u3, 8, axis=1)
    du = jax.tree_util.tree_map(jax.block_until_ready, du)
    t = timeit(lambda s: omm.mm(
        omm.DynSplit(s, du.scale, 8), loz["fwdB"][0], axis=1), du.slices)
    print(f"mm (int8 dots + reconstruct): {t*1e3:.3f} ms")

    t = timeit(lambda u: lzo.mass_apply_lattice_oz(
        u, loz, h._lat["Dq"], dims), u3)
    print(f"mass_apply_lattice_oz:        {t*1e3:.3f} ms")

    from laghos_tpu.ops import lattice as lop
    u32 = u3.astype(jnp.float32)
    Ts32 = tuple(T.astype(jnp.float32) for T in h._lat["Ts"])
    Dq32 = h._lat["Dq"].astype(jnp.float32)
    t = timeit(lambda u: lop.mass_apply_lattice(u, Ts32, Dq32, dims), u32)
    print(f"mass_apply_lattice f32:       {t*1e3:.3f} ms")

    t = timeit(lambda u: lzo.gradc_lattice_oz(u, loz)[0], u6)
    print(f"gradc_lattice_oz (C=6):       {t*1e3:.3f} ms")

    # full qupdate pieces
    S = h.S0
    sJit, _ = jax.block_until_ready(h._jq(S))
    t = timeit(lambda s: h._qupdate(s)[1], S)
    print(f"qupdate total:                {t*1e3:.3f} ms")

    def grad_only(s):
        x3 = s["x"].reshape((3,) + tuple(dims))
        v3 = s["v"].reshape((3,) + tuple(dims))
        J9, dV9 = lzo.grad18_lattice_oz(x3, v3, loz)
        return J9[0] + dV9[0]

    t = timeit(grad_only, S)
    print(f"qupdate grad18 only:          {t*1e3:.3f} ms")

    t = timeit(lambda sj: h._force_rhs_raw(sj), sJit)
    print(f"force_one (F.1):              {t*1e3:.3f} ms")
    t = timeit(lambda sj: h._force_transpose(sj, S["v"]), sJit)
    print(f"force_transpose:              {t*1e3:.3f} ms")

    B = jax.block_until_ready(h._jprep_v(h._jforce1(sJit)))
    t = timeit(lambda b: h._cg_velocity(b)[0], B, iters=10)
    it = jax.jit(lambda b: h._cg_velocity(b)[1])(B)
    print(f"cg_velocity (IR mode={h.opt.cg_ir}): {t*1e3:.3f} ms, "
          f"iters={int(it)}")


if __name__ == "__main__":
    main()
