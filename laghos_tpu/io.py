"""Output writers: VTU (unstructured XML VTK) + NPZ data collections.

Capability replacement for the reference's I/O surface (SURVEY M16):
GLVis socket streams and VisItDataCollection (laghos.cpp:691-701,866-871)
become VTU time-series files any ParaView/VisIt reads, and `-print`-style
raw dumps (laghos.cpp:873-900) become NPZ snapshots of the fields.

The high-order fields are sampled on a per-element refinement lattice
(default: the H1 nodes), which is how GLVis renders high-order data too.
"""

from __future__ import annotations

import os

import numpy as np


def _vtu_cells(dim, n):
    """Sub-cell connectivity of an n^dim lattice per element."""
    if dim == 1:
        cells = [[i, i + 1] for i in range(n - 1)]
        ctype = 3  # VTK_LINE
    elif dim == 2:
        cells = []
        for j in range(n - 1):
            for i in range(n - 1):
                a = i + n * j
                cells.append([a, a + 1, a + 1 + n, a + n])
        ctype = 9  # VTK_QUAD
    else:
        cells = []
        for k in range(n - 1):
            for j in range(n - 1):
                for i in range(n - 1):
                    a = i + n * (j + n * k)
                    b = a + n * n
                    cells.append([a, a + 1, a + 1 + n, a + n,
                                  b, b + 1, b + 1 + n, b + n])
        ctype = 12  # VTK_HEXAHEDRON
    return np.array(cells, dtype=np.int64), ctype


def write_vtu(path, hydro, S, fields=("rho", "v", "e")):
    """Write the current state as an unstructured VTU file."""
    import jax.numpy as jnp

    from .fem import basis as fb
    from .fem.quadrature import gauss_lobatto
    from .ops import tensor as top

    d = hydro.dim
    n = hydro.nd1
    NE = hydro.NE
    pts = gauss_lobatto(n)

    # evaluate positions at the H1 nodes of each element (identity for x)
    x_e = np.asarray(S["x"])[:, hydro.h1.gather].transpose(1, 0, 2)
    # (NE, d, nd) -> points (NE*nd, 3)
    xyz = np.zeros((NE, n**d, 3))
    xyz[:, :, :d] = np.moveaxis(x_e, 1, 2)

    v_e = np.asarray(S["v"])[:, hydro.h1.gather].transpose(1, 0, 2)
    vv = np.zeros((NE, n**d, 3))
    vv[:, :, :d] = np.moveaxis(v_e, 1, 2)

    # e and rho at the H1 lattice (Bernstein eval)
    Bl, _ = fb.bernstein_tables(hydro.opt.order_e, pts)
    et = np.asarray(S["e"]).reshape((NE,) + (hydro.l1d,) * d)
    for k in range(d):
        ax = et.ndim - 1 - k
        et = np.moveaxis(np.tensordot(et, Bl, axes=[[ax], [1]]), -1, ax)
    e_pts = et.reshape(NE, -1)

    rho_b = np.asarray(hydro.compute_density(S))
    rt = rho_b.reshape((NE,) + (hydro.l1d,) * d)
    for k in range(d):
        ax = rt.ndim - 1 - k
        rt = np.moveaxis(np.tensordot(rt, Bl, axes=[[ax], [1]]), -1, ax)
    rho_pts = rt.reshape(NE, -1)

    cells1, ctype = _vtu_cells(d, n)
    ncell1 = cells1.shape[0]
    npts1 = n**d
    conn = (cells1[None, :, :] + npts1 * np.arange(NE)[:, None, None])
    conn = conn.reshape(-1, cells1.shape[1])

    npts = NE * npts1
    ncells = NE * ncell1
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{npts}" NumberOfCells="{ncells}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, xyz.reshape(-1, 3), fmt="%.16g")
        f.write('</DataArray></Points>\n<Cells>\n')
        f.write('<DataArray type="Int64" Name="connectivity" '
                'format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write('</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        np.savetxt(f, np.arange(1, ncells + 1) * cells1.shape[1],
                   fmt="%d")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        np.savetxt(f, np.full(ncells, ctype), fmt="%d")
        f.write('</DataArray>\n</Cells>\n<PointData>\n')
        if "v" in fields:
            f.write('<DataArray type="Float64" Name="velocity" '
                    'NumberOfComponents="3" format="ascii">\n')
            np.savetxt(f, vv.reshape(-1, 3), fmt="%.16g")
            f.write('</DataArray>\n')
        if "e" in fields:
            f.write('<DataArray type="Float64" Name="specific_internal_'
                    'energy" format="ascii">\n')
            np.savetxt(f, e_pts.reshape(-1, 1), fmt="%.16g")
            f.write('</DataArray>\n')
        if "rho" in fields:
            f.write('<DataArray type="Float64" Name="density" '
                    'format="ascii">\n')
            np.savetxt(f, rho_pts.reshape(-1, 1), fmt="%.16g")
            f.write('</DataArray>\n')
        f.write('</PointData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n')


class DataCollection:
    """VisItDataCollection equivalent: a .pvd time series of VTU dumps +
    NPZ raw state snapshots."""

    def __init__(self, basename, hydro):
        self.basename = basename
        self.hydro = hydro
        self.entries = []
        os.makedirs(os.path.dirname(basename) or ".", exist_ok=True)

    def save(self, cycle, t, S):
        vtu = f"{self.basename}_{cycle:06d}.vtu"
        write_vtu(vtu, self.hydro, S)
        np.savez(f"{self.basename}_{cycle:06d}.npz",
                 x=np.asarray(S["x"]), v=np.asarray(S["v"]),
                 e=np.asarray(S["e"]), t=t, cycle=cycle)
        self.entries.append((t, os.path.basename(vtu)))
        with open(f"{self.basename}.pvd", "w") as f:
            f.write('<?xml version="1.0"?>\n<VTKFile type="Collection" '
                    'version="0.1">\n<Collection>\n')
            for tt, name in self.entries:
                f.write(f'<DataSet timestep="{tt}" file="{name}"/>\n')
            f.write('</Collection>\n</VTKFile>\n')


def max_rss_mb() -> int:
    """Peak resident set size in MB (the reference's -mb telemetry,
    laghos.cpp:1348-1358)."""
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for dev in jax.devices():
        try:
            out[str(dev)] = dev.memory_stats()
        except Exception:
            out[str(dev)] = None
    return out
