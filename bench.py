"""Headline benchmark: 3D Sedov FOM (megadofs x steps / sec) on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is the reference's FOM (BASELINE.md): time-weighted mix of the
CG-H1 / force / qupdate phase rates over a fixed number of 3D Sedov steps
at Q2-Q1.  The reference publishes no absolute number
(BASELINE.json.published = {}), so vs_baseline is reported as null until a
measured Laghos-CUDA FOM is available.
"""

import json
import os
import sys
import time

# Default platform: whatever the environment provides (TPU in the driver).
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("BENCH_PLATFORM", ""))
if not os.environ.get("JAX_PLATFORMS"):
    del os.environ["JAX_PLATFORMS"]


def main():
    import jax

    from laghos_tpu import driver
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options

    rs = int(os.environ.get("BENCH_RS", "2"))
    max_steps = int(os.environ.get("BENCH_STEPS", "20"))

    m = fmesh.load_mfem_mesh("/root/reference/data/cube01_hex.mesh")
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    opt = Options(problem=1, blast_energy=2.0, ode_solver=4)
    h = Hydro(m, opt)

    res = driver.run(h, t_final=0.6, max_steps=max_steps, vis_steps=1000,
                     timing=True, verbose=False)
    tim = res.timing_data
    rk_stages = 4
    steps = res.steps * rk_stages
    H1_dofs = h.ndof * 3
    L2_dofs = h.NE * h.ld
    T1, T2, T3 = tim.t["cgH1"], tim.t["force"], tim.t["qdata"]
    TT = T1 + T2 + T3
    H1iter = tim.H1iter // 3
    FOM1 = 1e-6 * H1_dofs * H1iter / T1 if T1 > 0 else 0.0
    FOM2 = 1e-6 * steps * (H1_dofs + L2_dofs) / T2 if T2 > 0 else 0.0
    FOM3 = 1e-6 * tim.quad_tstep * h.NQ / T3 if T3 > 0 else 0.0
    FOM = (FOM1 * T1 + FOM2 * T2 + FOM3 * T3) / TT if TT > 0 else 0.0

    print(json.dumps({
        "metric": "3D Sedov Q2-Q1 FOM (rs%d, %d steps, 1 chip)" % (
            rs, res.steps),
        "value": round(FOM, 3),
        "unit": "megadofs*steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
