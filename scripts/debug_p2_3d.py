import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options

m3 = fmesh.load_mfem_mesh("/root/reference/data/cube01_hex.mesh")
h3 = Hydro(m3, Options(problem=2, cg_tol=1e-14))
m2 = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
h2 = Hydro(m2, Options(problem=2, cg_tol=1e-14))

dS3, dt3, _ = jax.jit(h3._mult)(h3.S0)
dS2, dt2, _ = jax.jit(h2._mult)(h2.S0)
print("dtmin 2d/3d:", float(dt2), float(dt3))

# z-invariance of dv_x in 3D: group H1 nodes by (x, y)
xyz = h3.h1.node_coords
dvx = np.asarray(dS3["v"])[0]
key = np.round(xyz[:, :2] * 1e9).astype(np.int64)
from collections import defaultdict
groups = defaultdict(list)
for i, k in enumerate(map(tuple, key)):
    groups[k].append(i)
worst = 0.0
for k, idxs in groups.items():
    vals = dvx[idxs]
    worst = max(worst, float(vals.max() - vals.min()))
print("max z-spread of dv_x:", worst)
print("max |dv_z|:", float(np.abs(np.asarray(dS3['v'])[2]).max()))
print("max |dv_y|:", float(np.abs(np.asarray(dS3['v'])[1]).max()))

# compare dv_x profile against the 2D run at matching (x, y)
xy2 = h2.h1.node_coords
dvx2 = np.asarray(dS2["v"])[0]
map2 = {tuple(k): i for i, k in enumerate(
    np.round(xy2 * 1e9).astype(np.int64))}
err = 0.0
for k, idxs in groups.items():
    i2 = map2.get(k)
    if i2 is not None:
        err = max(err, float(np.abs(dvx[idxs] - dvx2[i2]).max()))
print("max |dv_x(3d) - dv_x(2d)|:", err)

# energy rhs comparison
de3 = np.asarray(dS3["e"])
de2 = np.asarray(dS2["e"])
print("de ranges 2d/3d:", de2.min(), de2.max(), de3.min(), de3.max())
