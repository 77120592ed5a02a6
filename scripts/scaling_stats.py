"""Distributed-partition diagnostics + (virtual-device) scaling trend.

Reports, for each device count:
  * slab/pencil partitions of a raster 3D Sedov mesh: per-device element
    counts and halo plane sizes,
  * SFC chunk partitions of an unstructured mesh: per-device elements,
    local dofs, shared boundary dofs (the O(surface) halo), and the
    communication fraction NB/ndof,
  * optionally (--run) wall-clock per step through the slab halo path on
    virtual CPU devices.  On one physical core virtual devices cannot
    show real speedup; the value of the trend is flat-ness (no
    pathological growth of collective overhead with D).

Reference counterpart: Laghos' strong-scaling FOM tables (BASELINE.md);
FOM1 division semantics are in laghos_tpu/timing.py:12-21.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options


def chunk_stats(mesh_path, counts=(2, 4, 8)):
    from laghos_tpu.parallel.chunk_hydro import ChunkHydro
    from laghos_tpu.parallel.partition import sfc_partition

    m = fmesh.load_netgen_2d(mesh_path)
    for _ in range(2):
        m = fmesh.uniform_refine(m)
    m = sfc_partition(m)
    h = Hydro(m, Options(problem=1))
    rows = []
    for D in counts:
        if D > len(jax.devices()):
            continue
        ch = ChunkHydro(h, n_devices=D)
        els = [len(c) for c in ch._chunks]
        dofs = [len(ld) for ld in ch._loc_dofs]
        rows.append({
            "D": D, "NE": h.NE, "ndof": h.ndof,
            "elems_per_dev": els,
            "elem_imbalance": max(els) / (sum(els) / len(els)),
            "local_dofs": dofs,
            "shared_boundary_dofs": int(ch.NB),
            "comm_fraction": round(ch.NB / h.ndof, 4),
        })
    return rows


def slab_stats(rs=2, counts=(2, 4, 8)):
    from laghos_tpu.parallel.slab_hydro import SlabHydro

    n = 2 ** rs * 2
    m = fmesh.cartesian(3, (n, n, n), (1.0, 1.0, 1.0))
    h = Hydro(m, Options(problem=1, blast_energy=0.25))
    rows = []
    for D in counts:
        if D > len(jax.devices()) or n % D:
            continue
        sh = SlabHydro(h, n_devices=D)
        # halo = one plane of dofs per device boundary
        plane = h.ndof // (n * h.opt.order_v + 1)
        rows.append({
            "D": D, "NE": h.NE, "ndof": h.ndof,
            "elems_per_dev": h.NE // D,
            "halo_plane_dofs": plane,
            "halo_fraction": round(plane * 2 * (D - 1) / D / h.ndof, 4),
        })
    return rows


def run_trend(rs=2, counts=(1, 2, 4, 8), steps=10):
    from laghos_tpu import driver as drv
    from laghos_tpu.parallel.slab_hydro import SlabHydro

    n = 2 ** rs * 2
    rows = []
    for D in counts:
        if D > len(jax.devices()) or n % D:
            continue
        m = fmesh.cartesian(3, (n, n, n), (1.0, 1.0, 1.0))
        h = Hydro(m, Options(problem=1, blast_energy=0.25))
        rh = h if D == 1 else SlabHydro(h, n_devices=D)
        r = drv.run(rh, t_final=0.6, max_steps=2, verbose=False)  # compile
        t0 = time.perf_counter()
        r = drv.run(rh, t_final=0.6, max_steps=steps, verbose=False)
        dt_wall = (time.perf_counter() - t0) / r.steps
        rows.append({"D": D, "steps": r.steps,
                     "wall_per_step_s": round(dt_wall, 4),
                     "e_norm": float(h.e_norm(r.S) if D == 1
                                     else rh.e_norm(r.S))})
    return rows


if __name__ == "__main__":
    out = {
        "slab": slab_stats(),
        "chunk_unstr": chunk_stats(
            "/root/reference/data/square01_quad_unstr.mesh"),
    }
    if "--run" in sys.argv:
        out["virtual_device_trend"] = run_trend()
    print(json.dumps(out, indent=1))
    with open("/tmp/scaling_stats.json", "w") as fp:
        json.dump(out, fp)
