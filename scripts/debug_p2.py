import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu import driver
from laghos_tpu.ops import qupdate as qop
from laghos_tpu.ops import smallmat

m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
opt = Options(problem=2, cg_tol=1e-14)
h = Hydro(m, opt)

def on_vis(ti, t, S):
    x_e = S["x"][:, h.gather].transpose(1, 0, 2)
    J = qop.jacobians(x_e, h.tables["H1B"], h.tables["H1G"], 2)
    detJ = smallmat.det(J, 2)
    ie, ke = h.energies(S)
    vy = float(jnp.max(jnp.abs(S["v"][1])))
    print(f"  ti={ti} t={t:.4f} min_detJ={float(jnp.min(detJ)):.3e} "
          f"E={float(ie)+float(ke):.12f} max|vy|={vy:.3e}")

res = driver.run(h, t_final=0.6, max_steps=200, vis_steps=1,
                 on_vis=on_vis, verbose=True)
print("final", res.steps, res.e_norm)
