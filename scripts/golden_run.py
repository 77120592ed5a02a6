"""End-state golden runner: the 9 'Verification of Results' rows
(reference README.md:225-235, reproduced in BASELINE.md).

Usage: python scripts/golden_run.py <row>   (1-9; runs to t_final and
compares final step count, dt and |e| against the table)

    SLAB_DEVICES=8 python scripts/golden_run.py <row>
runs the same row through the structured-slab shard_map halo path on
that many virtual CPU devices (np-invariance of the production
multi-chip mode; rows on Cartesian meshes with PA only — row 5 is 1D
full-assembly, which neither we nor the reference distribute with PA).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLAB = int(os.environ.get("SLAB_DEVICES", "0"))
if SLAB:
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={SLAB}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", os.environ.get("CHK_PLATFORM", "cpu"))

GOLDEN = {
    # row: (problem, mesh, rs, tf, pa, extra_opts, step, dt, |e|)
    1: (0, "square01_quad", 3, 0.75, True, {}, 339, 0.000702,
        4.9695537349e+01),
    2: (0, "cube01_hex", 1, 0.75, True, {}, 1041, 0.000121, 3.3909635545e+03),
    3: (1, "square01_quad", 3, 0.8, True, {}, 1154, 0.001655,
        4.6303396053e+01),
    4: (1, "cube01_hex", 2, 0.6, True, {"blast_energy": 2.0}, 560, 0.002449,
        1.3408616722e+02),
    5: (2, "segment01", 5, 0.2, False, {}, 413, 0.000470, 3.2012077410e+01),
    6: (3, "rectangle01_quad", 2, 3.0, True, {}, 2872, 0.000064,
        5.6547039096e+01),
    7: (3, "box01_hex", 1, 5.0, True, {}, 858, 0.000474, 5.6691500623e+01),
    8: (4, "square_gresho", 3, 0.62831853, True,
        {"order_v": 3, "order_e": 2, "ode_solver": 7}, 776, 0.000045,
        4.0982431726e+02),
    9: (7, "rt2D", 1, 4.0, True, {"order_v": 4, "order_e": 3}, 2462,
        0.000050, 1.1792848680e+02),
    # serial-variant row 7 (serial/README.md:96-105): tf 3.0 variant.
    # NOTE: this golden is inconsistent with the MAIN reference code: our
    # trajectory reproduces main row 7 (858 steps @ tf 5.0, |e| to 1e-12)
    # and crosses t=3.0 at ~step 287, so no code consistent with main can
    # also produce 528 steps at t=3.0 — the serial table predates the
    # main physics (its --checks step table differs too).  Kept for
    # reference; not a pass/fail target.
    10: (3, "box01_hex", 1, 3.0, True, {}, 528, 0.000180, 5.6505348812e+01),
}


def run_row(row, verbose=True):
    from laghos_tpu import driver
    from laghos_tpu.data import get_mesh
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options

    (pb, mesh_name, rs, tf, pa, extra, ref_step, ref_dt, ref_norm) = \
        GOLDEN[row]
    m = get_mesh(f"/root/reference/data/{mesh_name}.mesh")
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    opt = Options(problem=pb, p_assembly=pa, **extra)
    h = Hydro(m, opt)
    print(f"row {row}: p{pb} {mesh_name} rs{rs} NE={m.num_elems} "
          f"ndof={h.ndof}")
    run_h = h
    if SLAB:
        from laghos_tpu.parallel.slab_hydro import SlabHydro

        run_h = SlabHydro(h, n_devices=SLAB)
    res = driver.run(run_h, t_final=tf, vis_steps=50, verbose=verbose)
    rel = abs(res.e_norm - ref_norm) / ref_norm
    ok = (res.steps == ref_step) and rel < 1e-9
    print(f"row {row}: steps {res.steps} (ref {ref_step}), "
          f"dt {res.dt:.6f} (ref {ref_dt}), |e| {res.e_norm:.10e} "
          f"(ref {ref_norm:.10e}, rel {rel:.2e}) "
          f"energy_diff {abs(res.energy_init-res.energy_final):.2e} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_row(int(sys.argv[1]))
    else:
        ok_all = True
        for row in sorted(GOLDEN):
            if row == 10:
                continue          # documented-stale serial golden
            ok_all &= run_row(row, verbose=False)
        print("ALL-OK" if ok_all else "SOME-FAILED")
