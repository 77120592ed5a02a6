"""Triangle meshes: loader hookup, refinement, H1/L2 numbering.

Complements fem/mesh.py (tensor elements) with the simplex capability the
reference gets from MFEM for files like data/square01_tri.mesh (SURVEY
M1).  Node identification reuses the exact integer barycentric-weight
keys: the node at barycentric (i, j, k)/p of a triangle with vertices
(a, b, c) has key {(a,i), (b,j), (c,k)} (zero weights dropped) — identical
from both sides of any shared edge regardless of orientation.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..native import unify_rows
from .simplex import _bary_lattice


@dataclasses.dataclass
class TriMesh:
    verts: np.ndarray      # (nv, 2)
    elems: np.ndarray      # (NE, 3) vertex ids
    bdr_verts: np.ndarray  # (NB, 2)
    bdr_attr: np.ndarray   # (NB,)
    dim: int = 2

    @property
    def num_elems(self):
        return self.elems.shape[0]

    def element_volumes(self):
        a = self.verts[self.elems[:, 0]]
        b = self.verts[self.elems[:, 1]]
        c = self.verts[self.elems[:, 2]]
        return 0.5 * np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def load_tri_mesh(path: str) -> TriMesh:
    """MFEM v1.0 reader for triangle meshes (same token grammar as
    mesh.load_mfem_mesh)."""
    from . import mesh as fmesh

    # reuse the tokenizer by patching the geometry guard
    with open(path) as f:
        tokens = []
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                tokens.extend(line.split())
    it = iter(tokens)
    dim = None
    elems, bdr = [], []
    verts = None
    nv = 0
    nodes_vals = None
    vdim = None
    while True:
        try:
            tok = next(it)
        except StopIteration:
            break
        if tok == "dimension":
            dim = int(next(it))
        elif tok == "elements":
            ne = int(next(it))
            for _ in range(ne):
                attr = int(next(it))
                geom = int(next(it))
                assert geom == fmesh.TRIANGLE, "triangle mesh expected"
                elems.append([int(next(it)) for _ in range(3)])
        elif tok == "boundary":
            nb = int(next(it))
            for _ in range(nb):
                attr = int(next(it))
                geom = int(next(it))
                bdr.append((attr, [int(next(it)) for _ in range(2)]))
        elif tok == "vertices":
            nv = int(next(it))
            tok2 = next(it)
            if tok2 == "nodes":
                rest = list(it)
                vals = []
                i = 0
                while i < len(rest):
                    t = rest[i]
                    if t in ("FiniteElementSpace",):
                        i += 1
                    elif t.startswith("FiniteElementCollection"):
                        i += 2
                    elif t.startswith("VDim"):
                        vdim = int(rest[i + 1])
                        i += 2
                    elif t.startswith("Ordering"):
                        i += 2
                    else:
                        vals.append(float(t))
                        i += 1
                nodes_vals = np.array(vals)
                break
            else:
                vdim = int(tok2)
                vals = [float(next(it)) for _ in range(nv * vdim)]
                verts = np.array(vals).reshape(nv, vdim)
    if verts is None:
        verts = nodes_vals.reshape(vdim, nv).T
    return TriMesh(
        verts[:, :2].astype(np.float64),
        np.array(elems, dtype=np.int32),
        np.array([v for (_, v) in bdr], dtype=np.int32),
        np.array([a for (a, _) in bdr], dtype=np.int32),
    )


def uniform_refine_tri(m: TriMesh) -> TriMesh:
    """1:4 red refinement via edge midpoints."""
    NE = m.num_elems
    e = m.elems.astype(np.int64)
    # midpoint keys: sorted vertex pairs; corners: (v, v)
    pairs = np.stack([
        np.sort(np.stack([e[:, 0], e[:, 1]], 1), 1),
        np.sort(np.stack([e[:, 1], e[:, 2]], 1), 1),
        np.sort(np.stack([e[:, 0], e[:, 2]], 1), 1),
    ], axis=1)                                   # (NE, 3, 2)
    corners = np.stack([e, e], axis=-1)          # (NE, 3, 2)
    rows = np.concatenate([corners, pairs], axis=1).reshape(-1, 2)
    brows = np.concatenate([
        np.stack([m.bdr_verts, m.bdr_verts], -1).reshape(-1, 2),
        np.sort(m.bdr_verts, axis=1)], axis=0).astype(np.int64)
    allrows = np.concatenate([rows, brows])
    nnew, inverse, first = unify_rows(allrows)
    coords = m.verts[allrows[:, 0]] * 0.5 + m.verts[allrows[:, 1]] * 0.5
    new_verts = coords[first]
    ids = inverse[:NE * 6].reshape(NE, 6)        # v0 v1 v2 m01 m12 m02
    v0, v1, v2, m01, m12, m02 = [ids[:, k] for k in range(6)]
    children = np.stack([
        np.stack([v0, m01, m02], 1),
        np.stack([m01, v1, m12], 1),
        np.stack([m02, m12, v2], 1),
        np.stack([m01, m12, m02], 1),
    ], axis=1).reshape(NE * 4, 3)
    nb = m.bdr_verts.shape[0]
    bc = inverse[NE * 6:NE * 6 + 2 * nb].reshape(nb, 2)  # endpoint ids
    bm = inverse[NE * 6 + 2 * nb:]                       # midpoint ids
    new_bdr = np.concatenate([
        np.stack([bc[:, 0], bm], 1), np.stack([bm, bc[:, 1]], 1)])
    new_attr = np.concatenate([m.bdr_attr, m.bdr_attr])
    return TriMesh(new_verts, children.astype(np.int32),
                   new_bdr.astype(np.int32), new_attr.astype(np.int32))


def build_tri_h1(m: TriMesh, p: int):
    """Global H1 numbering + ess masks for P_p on triangles."""
    lat = _bary_lattice(p)                       # (nd, 3)
    NE = m.num_elems
    nd = lat.shape[0]
    vert = m.elems[:, None, :].repeat(nd, axis=1).astype(np.int64)
    wts = np.broadcast_to(lat[None], (NE, nd, 3)).astype(np.int64).copy()
    vert = vert.copy()
    vert[wts == 0] = -1
    w2 = wts.copy()
    w2[vert == -1] = 0
    order = np.lexsort((w2.reshape(-1, 3), vert.reshape(-1, 3)), axis=-1)
    fv = np.take_along_axis(vert.reshape(-1, 3), order, axis=-1)
    fw = np.take_along_axis(w2.reshape(-1, 3), order, axis=-1)
    keys = np.concatenate([fv, fw], axis=1)
    ndof, inverse, first = unify_rows(keys)
    gather = inverse.reshape(NE, nd).astype(np.int32)
    # node coords: barycentric combination of vertices
    bw = lat.astype(np.float64) / p
    epos = np.einsum("nc,ecd->end", bw, m.verts[m.elems])
    flat_g = gather.reshape(-1)
    firstidx = np.zeros(ndof, dtype=np.int64)
    firstidx[flat_g[::-1]] = np.arange(flat_g.size - 1, -1, -1)
    node_coords = epos.reshape(-1, 2)[firstidx]

    # boundary attrs per dof
    uniq = keys[first]
    supp_v = uniq[:, :3]
    vert_faces: dict = {}
    face_sets = []
    for b in range(m.bdr_verts.shape[0]):
        fs = frozenset(int(v) for v in m.bdr_verts[b])
        face_sets.append(fs)
        for v in fs:
            vert_faces.setdefault(v, []).append(b)
    ess = np.zeros((2, ndof), dtype=bool)
    for g in range(ndof):
        vs = [int(v) for v in supp_v[g] if v >= 0]
        for b in vert_faces.get(vs[0], []):
            if all(v in face_sets[b] for v in vs):
                attr = int(m.bdr_attr[b])
                if 1 <= attr <= 2:
                    ess[attr - 1, g] = True
    return {"gather": gather, "ndof": ndof, "coords": node_coords,
            "ess": ess}
