"""AMR diagnostic anchor: run the golden-verified MAIN solver on the
uniformly refined mesh (the AMR runs' finest resolution) with the AMR
variant's parameters, and report |e| in the AMR table's norm — the raw
l2 norm of GL-NODAL L2 dofs (amr/laghos.cpp:552-559 prints
sqrt(e_gf*e_gf); the AMR build uses the default GL-nodal L2 basis).

If the reference AMR table row is close to this fully-refined anchor,
the reference run keeps the shock region (and most of the domain
history) at max depth; if far below it, it derefines aggressively.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("CHK_PLATFORM", "cpu"))

import numpy as np

from laghos_tpu import driver
from laghos_tpu.fem import basis as fb
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.fem import quadrature as fq
from laghos_tpu.hydro import Hydro, Options


def main(rs=4, tf=0.8, ok=2, ot=1):
    m = fmesh.cartesian(2, (2, 2), (1.0, 1.0))
    for _ in range(rs):
        m = fmesh.uniform_refine(m)
    opt = Options(problem=1, blast_energy=0.25, order_v=ok, order_e=ot,
                  cg_tol=1e-8)
    h = Hydro(m, opt)
    res = driver.run(h, t_final=tf, max_steps=-1, vis_steps=100,
                     verbose=True)
    e = np.asarray(res.S["e"])            # Bernstein dofs (main basis)
    # convert to GL-nodal dofs: evaluate the Bernstein polynomial at the
    # GL nodes of order ot
    gln, _ = fq.gauss_legendre(ot + 1)
    T = fb.bernstein_tables(ot, gln)[0]     # (ot+1 pts, ot+1 basis)
    d = m.dim
    et = e.reshape((h.NE,) + (ot + 1,) * d)
    out = et
    for k in range(d):
        ax = out.ndim - 1 - k
        out = np.moveaxis(np.tensordot(out, T, axes=[[ax], [1]]), -1, ax)
    e_nodal = out.reshape(h.NE, -1)
    print(f"uniform rs{rs} steps={res.steps} dt={res.dt:.6f} "
          f"|e|_GLnodal={np.sqrt((e_nodal**2).sum()):.10f} "
          f"|e|_bernstein={np.sqrt((e**2).sum()):.10f}")


if __name__ == "__main__":
    rs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(rs=rs)
