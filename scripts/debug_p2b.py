import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu import driver

m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
opt = Options(problem=2, cg_tol=1e-14)
h = Hydro(m, opt)

S = h.S0
t = 0.0
dt = float(h.dt_estimate(S))
count1 = False
ti = 1
while ti <= 60:
    S_old, t_old = S, t
    S_new, dt_est, _ = h.advance(S, dt, count1)
    count1 = False
    dt_est = float(dt_est)
    if ti >= 44:
        e = np.asarray(S_new["e"]); v = np.asarray(S_new["v"])
        print(f"ti={ti} t={t:.6f} dt={dt:.3e} dt_est={dt_est:.3e} "
              f"accept={not (dt_est < dt)} nan_e={np.isnan(e).sum()} "
              f"max|v|={np.abs(v).max():.3e} max e={e.max():.3e}")
    if dt_est < dt:
        dt *= 0.85
        S = S_old; t = t_old
        count1 = True
        continue
    S = S_new
    t += dt
    if dt_est > 1.25 * dt:
        dt *= 1.02
    ti += 1
