"""Microbenchmarks deciding the f64 strategy: XLA-emulated f64 matmul vs
Ozaki int8-slice matmul, and the f64 cost of the pointwise physics chain.

Run on the TPU:  python scripts/bench_f64_parts.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=20):
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
    from laghos_tpu.ops import omm

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    shapes = [
        ("Q2 mass (M=98k,k=27,n=64)", 98304, 27, 64),
        ("Q2 grad-T (M=32k,k=64,n=27)", 32768, 64, 27),
        ("Q4 mass (M=12k,k=125,n=512)", 12288, 125, 512),
        ("Q4 grad (M=12k,k=512,n=125)", 12288, 512, 125),
    ]
    for name, M, k, n in shapes:
        A64 = jnp.asarray(rng.normal(size=(M, k)))
        B64 = jnp.asarray(rng.normal(size=(k, n)))
        A32 = A64.astype(jnp.float32)
        B32 = B64.astype(jnp.float32)
        st = omm.split_static(np.asarray(B64))

        t_f64 = timeit(lambda a, b: a @ b, A64, B64)
        t_f32 = timeit(lambda a, b: a @ b, A32, B32)
        t_oz = timeit(lambda a: omm.matmul(a, st), A64)
        t_sp = timeit(lambda a: omm.split_dyn(a).slices[0], A64)
        # accuracy of the ozaki product
        ref = np.asarray(A64) @ np.asarray(B64)
        got = np.asarray(jax.jit(lambda a: omm.matmul(a, st))(A64))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"{name}: f64 {t_f64*1e3:8.3f} ms | f32 {t_f32*1e3:8.3f} ms"
              f" | omm {t_oz*1e3:8.3f} ms (split {t_sp*1e3:.3f}) "
              f"({t_f64/t_oz:4.1f}x vs f64, rel err {err:.2e})")

    # pointwise physics chain cost: f64 vs f32
    from laghos_tpu.ops import qphys

    for NE, NQ, tag in [(32768, 64, "Q2 rs4")]:
        for dt in (jnp.float32, jnp.float64):
            z = lambda: jnp.asarray(rng.normal(size=(NE, NQ)), dt)
            J9 = tuple(z() + (3.0 if i in (0, 4, 8) else 0.0)
                       for i in range(9))
            dV9 = tuple(z() for _ in range(9))
            J0i9 = tuple(z() * 0.1 + (1.0 if i in (0, 4, 8) else 0.0)
                         for i in range(9))
            e_q = jnp.abs(z())
            rw = jnp.abs(z()) + 0.5
            gam = jnp.full((NE, 1), 1.4, dt)
            winv = jnp.abs(z()[0]) + 0.5
            h0e = jnp.full((NE, NQ), 0.01, dt)

            def phys(J9, dV9, J0i9, e_q, rw):
                s, dtq, v = qphys.physics_3d(
                    J9, dV9, J0i9, e_q, rw, gam, winv, h0_e=h0e,
                    h1order=2.0, cfl=0.5, use_vorticity=False)
                return sum(s) + dtq + v

            t = timeit(phys, J9, dV9, J0i9, e_q, rw, iters=10)
            print(f"physics_3d {tag} {np.dtype(dt).name}: {t*1e3:8.3f} ms")

    # f64 elementwise throughput probe
    for dt in (jnp.float32, jnp.float64):
        a = jnp.asarray(rng.normal(size=(4096, 4096)), dt)
        t = timeit(lambda x: ((x * 1.0000001 + 0.5) * x - x * 0.3) * x + x,
                   a, iters=50)
        gops = 5 * a.size / t / 1e9
        print(f"elementwise {np.dtype(dt).name}: {t*1e3:.3f} ms "
              f"({gops:.0f} Gop/s)")


if __name__ == "__main__":
    main()
