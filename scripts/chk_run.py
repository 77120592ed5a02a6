"""Quick golden-gate runner: reproduce the reference --checks configs.

Canonical config (laghos.cpp:903-919): square01_quad / cube01_hex, rs0,
ok2 ot1, RK4, tf 0.6, cfl 0.5, cgt 1e-14; compare |e| at step 5 and at a
per-problem later step against laghos.cpp:1441-1463.
"""

import os
import sys

PLATFORM = os.environ.get("CHK_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", PLATFORM)

import numpy as np

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu import driver

IT_NORMS = {
    2: {
        0: [(5, 6.546538624534384e+00), (27, 7.588576357792927e+00)],
        1: [(5, 3.508254945225794e+00), (15, 2.756444596823211e+00)],
        2: [(5, 1.020745795651244e+01), (59, 1.721590205901898e+01)],
        3: [(5, 8.0), (16, 8.0)],
        4: [(5, 3.446324942352448e+01), (18, 3.446844033767240e+01)],
        5: [(5, 1.030899557252528e+01), (36, 1.057362418574309e+01)],
        6: [(5, 8.039707010835693e+00), (36, 8.316970976817373e+00)],
        7: [(5, 1.514929259650760e+01), (25, 1.514931278155159e+01)],
    },
    3: {
        0: [(5, 1.198510951452527e+03), (188, 1.199384410059154e+03)],
        1: [(5, 6.695818592962833e+00), (20, 4.267902387082487e+00)],
        2: [(5, 2.041491591302486e+01), (59, 3.443180411803796e+01)],
        3: [(5, 1.6e+01), (16, 1.6e+01)],
        4: [(5, 6.892649884704898e+01), (18, 6.893688067534482e+01)],
        5: [(5, 2.061984481890964e+01), (36, 2.114519664792607e+01)],
        6: [(5, 1.607988713996459e+01), (36, 1.662736010353023e+01)],
        7: [(5, 3.029858112572883e+01), (24, 3.029858832743707e+01)],
    },
}


def run_check(problem, dim, pa=True, max_steps=None, verbose=True):
    """pa=False exercises the full-assembly solve path against the same
    golden table (the reference checks matrix covers both, makefile:193)."""
    mfile = ("/root/reference/data/square01_quad.mesh" if dim == 2
             else "/root/reference/data/cube01_hex.mesh")
    m = fmesh.load_mfem_mesh(mfile)
    opt = Options(problem=problem, order_v=2, order_e=1, cfl=0.5,
                  cg_tol=1e-14, p_assembly=pa, ode_solver=4)
    h = Hydro(m, opt)
    checks = IT_NORMS[dim][problem]
    # step repetitions count as attempts (laghos.cpp:760), so allow slack
    steps_needed = checks[-1][0] * 3 + 20
    res = driver.run(h, t_final=0.6,
                     max_steps=max_steps if max_steps else steps_needed,
                     vis_steps=1, check_steps=tuple(s for s, _ in checks),
                     verbose=verbose)
    ok = True
    for s, ref in checks:
        got = res.norms.get(s)
        if got is None:
            print(f"  p{problem} {dim}D: step {s} not reached")
            ok = False
            continue
        rel = abs(got - ref) / abs(ref)
        status = "OK " if rel < 1e-13 else "FAIL"
        print(f"  p{problem} {dim}D step {s}: got {got:.15e} "
              f"ref {ref:.15e} rel {rel:.2e} {status}")
        ok = ok and rel < 1e-13
    return ok


if __name__ == "__main__":
    problem = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pa = "--fa" not in sys.argv
    sys.exit(0 if run_check(problem, dim, pa=pa) else 1)
