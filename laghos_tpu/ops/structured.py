"""Structured (parity-decomposed) E<->L transforms for Cartesian meshes.

The PA operator chain is E-vector-centric (the reference's D2Q/Q2D
restriction maps, laghos_assembly.cpp).  On TPU, the generic L<->E
transitions — a 27-wide incidence gather or a scatter-add — are the
dominant cost of a CG iteration at production sizes (~20 ms per apply at
275k dofs: XLA lowers random-access gathers to near-scalar code).  For a
Cartesian n_x x n_y x n_z mesh of order-p tensor elements the dof lattice
has parity structure: element dof blocks span p+1 lattice units while
same-parity neighbours are 2p apart, so splitting elements by
(e_x%2, e_y%2, e_z%2) gives 2^d groups of DISJOINT blocks.  Each group's
restriction/assembly is then dense pads + reshapes (pure HBM-bandwidth
copies, no data-dependent addressing); the only irregular op left is ONE
ndof-sized permutation between the topological dof numbering and the
raster lattice numbering.  The topological numbering is kept so
trajectories stay bit-identical with the generic path's dof order.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class StructMaps:
    """Precomputed maps for structured E<->L transforms."""

    dims: tuple          # (n_x, n_y, n_z) element grid
    p: int               # H1 order
    perm: np.ndarray     # raster lattice id -> topological dof id
    inv: np.ndarray      # topological dof id -> raster lattice id
    e_mesh_at_raster: np.ndarray   # (NE,) mesh element id at raster pos
    e_raster_at_mesh: np.ndarray   # (NE,) raster pos of mesh element

    @property
    def identity_perm(self) -> bool:
        return bool(self.perm[0] == 0 and self.perm[-1] == self.perm.size - 1
                    and (self.perm == np.arange(self.perm.size)).all())


def renumber_space_to_raster(space, sm: "StructMaps") -> "StructMaps":
    """Relabel the H1 space's global dof numbering to the raster lattice
    order, IN PLACE, so the struct transforms' permutation becomes the
    identity (a 275k-dof gather costs ~1.7 ms each way on TPU — 70% of a
    mass apply).  All downstream consumers (node_coords, ess masks,
    initial fields) derive from the space, so the relabeling is globally
    consistent; only summation orders change (roundoff-level).
    Returns the updated StructMaps (perm = identity)."""
    inv = sm.inv          # old topo id -> raster id == new id
    space.gather = inv[space.gather].astype(np.int32)
    nc = np.empty_like(space.node_coords)
    nc[inv] = space.node_coords
    space.node_coords = nc
    da = [None] * space.ndof
    for old, new in enumerate(inv):
        da[new] = space.dof_attrs[old]
    space.dof_attrs = da
    ident = np.arange(space.ndof, dtype=np.int32)
    return StructMaps(dims=sm.dims, p=sm.p, perm=ident, inv=ident,
                      e_mesh_at_raster=sm.e_mesh_at_raster,
                      e_raster_at_mesh=sm.e_raster_at_mesh)


def reorder_mesh_elements_to_raster(mesh):
    """If `mesh` is a uniform Cartesian grid, return a copy with elements
    sorted in raster (x-fastest) order; else None.  Makes the element
    reorder in the struct transforms the identity (element order is
    otherwise arbitrary — only per-dof summation order shifts)."""
    import dataclasses as _dc

    d = mesh.dim
    cent = mesh.verts[mesh.corners_lattice()].mean(axis=1)
    lo, hi = mesh.verts.min(axis=0), mesh.verts.max(axis=0)
    dims = tuple(
        np.unique(np.round((cent[:, k] - lo[k]) * 1e10).astype(np.int64)).size
        for k in range(d))
    if int(np.prod(dims)) != mesh.num_elems or (hi <= lo).any():
        return None
    h = (hi - lo) / np.array(dims)
    pos = np.round((cent - lo) / h - 0.5).astype(np.int64)
    if (pos < 0).any() or (pos >= np.array(dims)).any():
        return None
    key = pos[:, 0].copy()
    stride = dims[0]
    for k in range(1, d):
        key = key + pos[:, k] * stride
        stride *= dims[k]
    if np.unique(key).size != mesh.num_elems:
        return None
    order = np.argsort(key, kind="stable")
    if (order == np.arange(order.size)).all():
        return mesh
    return _dc.replace(mesh, elems=mesh.elems[order].copy())


def detect_structure(mesh, gather, p):
    """Recognise `mesh` as a uniform axis-aligned Cartesian grid.

    Returns StructMaps or None.  Recognition is by element centroids
    (must form an exact lattice) plus a bijection check between the
    element-block lattice ids and the H1 dofs of the gather map.  Any
    unstructured mesh fails the checks and the caller falls back to the
    generic gather/scatter path.
    """
    d = mesh.dim
    gather = np.asarray(gather)
    NE, nd = gather.shape
    if nd != (p + 1) ** d or NE != mesh.num_elems:
        return None
    cent = mesh.verts[mesh.corners_lattice()].mean(axis=1)  # (NE, d)
    lo, hi = mesh.verts.min(axis=0), mesh.verts.max(axis=0)
    dims = tuple(
        np.unique(np.round((cent[:, k] - lo[k]) * 1e10).astype(np.int64)).size
        for k in range(d))
    if int(np.prod(dims)) != NE or (hi <= lo).any():
        return None
    h = (hi - lo) / np.array(dims)
    pos = np.round((cent - lo) / h - 0.5).astype(np.int64)    # (NE, d)
    if (pos < 0).any() or (pos >= np.array(dims)).any():
        return None
    key = pos[:, 0].copy()
    stride = dims[0]
    for k in range(1, d):
        key = key + pos[:, k] * stride
        stride *= dims[k]
    if np.unique(key).size != NE:
        return None
    e_raster_at_mesh = key.astype(np.int32)                  # mesh -> raster
    e_mesh_at_raster = np.empty(NE, dtype=np.int32)
    e_mesh_at_raster[key] = np.arange(NE)
    # per-dof lattice id via the gather map (local nodes x-fastest)
    nl = np.stack([g.reshape(-1, order="F") for g in np.meshgrid(
        *([np.arange(p + 1)] * d), indexing="ij")], axis=1)   # (nd, d)
    lat = [dims[k] * p + 1 for k in range(d)]
    ndof = int(gather.max()) + 1
    if ndof != int(np.prod(lat)):
        return None
    glat = np.zeros((NE, nd), dtype=np.int64)
    stride = 1
    for k in range(d):
        glat += (pos[:, k][:, None] * p + nl[None, :, k]) * stride
        stride *= lat[k]
    inv = np.full(ndof, -1, dtype=np.int64)
    inv[gather.reshape(-1)] = glat.reshape(-1)
    if (inv < 0).any() or np.unique(inv).size != ndof:
        return None
    perm = np.empty(ndof, dtype=np.int64)
    perm[inv] = np.arange(ndof)
    return StructMaps(dims=dims, p=p, perm=perm.astype(np.int32),
                      inv=inv.astype(np.int32),
                      e_mesh_at_raster=e_mesh_at_raster,
                      e_raster_at_mesh=e_raster_at_mesh)


def _nb(n, q):
    """Number of elements with index parity q along an axis of n."""
    return (n - 1 - q) // 2 + 1 if n - 1 >= q else 0


def _windows(v, n, p):
    """(..., L=np+1) -> (..., n, p+1) overlapping element windows.

    Window e starts at lattice e*p.  Same-parity windows are 2p apart
    (disjoint for p >= 1), so each parity class is a pad + reshape; the
    parities interleave back by a stack + reshape (no strided scatter)."""
    parts = {}
    nbs = {}
    for q in (0, 1):
        nb = _nb(n, q)
        nbs[q] = nb
        if nb == 0:
            continue
        start = q * p
        need = start + nb * 2 * p
        pad = max(0, need - v.shape[-1])
        w = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
        w = w[..., start:start + nb * 2 * p]
        parts[q] = w.reshape(v.shape[:-1] + (nb, 2 * p))[..., :p + 1]
    if 1 not in parts:
        return parts[0]
    p0, p1 = parts[0], parts[1]
    if nbs[1] < nbs[0]:        # odd n: pad the shorter parity by one row
        p1 = jnp.pad(p1, [(0, 0)] * (p1.ndim - 2) + [(0, 1), (0, 0)])
    out = jnp.stack([p0, p1], axis=-2)        # (..., nb0, 2, p+1)
    out = out.reshape(v.shape[:-1] + (2 * nbs[0], p + 1))
    return out[..., :n, :]


def _windows_t(w, n, p):
    """Transpose of _windows: (..., n, p+1) -> (..., np+1) with adds."""
    L = n * p + 1
    # de-interleave by reshape instead of strided slicing
    nb0, nb1 = _nb(n, 0), _nb(n, 1)
    wp = w
    if n % 2 == 1:
        wp = jnp.pad(w, [(0, 0)] * (w.ndim - 2) + [(0, 1), (0, 0)])
    wp = wp.reshape(w.shape[:-2] + (nb0, 2, p + 1))
    parts = {0: wp[..., 0, :], 1: wp[..., 1, :][..., :nb1, :]}
    acc = None
    for q in (0, 1):
        nb = _nb(n, q)
        if nb == 0:
            continue
        v = parts[q]                                          # (..., nb, p+1)
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, p - 1)])
        v = v.reshape(v.shape[:-2] + (nb * 2 * p,))
        start = q * p
        pad_r = (L + 2 * p) - (start + nb * 2 * p)
        full = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(start, pad_r)])
        full = full[..., :L]
        acc = full if acc is None else acc + full
    return acc


def l_to_e_struct(u_l, sm: StructMaps):
    """L-vector (..., ndof) -> E-vector (..., NE, (p+1)^d), mesh order."""
    p, d = sm.p, len(sm.dims)
    lat = [n * p + 1 for n in sm.dims]
    lead = u_l.shape[:-1]
    nl = len(lead)
    u = u_l if sm.identity_perm else u_l[..., jnp.asarray(sm.perm)]
    u = u.reshape(lead + tuple(lat[::-1]))
    ident_e = bool((sm.e_raster_at_mesh
                    == np.arange(sm.e_raster_at_mesh.size)).all())
    # axes after lead: (z, y, x).  Step k consumes lattice axis k
    # (x first) and appends (n_k, p+1) at the end.
    for k in range(d):
        u = jnp.moveaxis(u, nl + (d - 1 - k), -1)
        u = _windows(u, sm.dims[k], p)
    # axes: lead + (n_x, l_x, n_y, l_y, n_z, l_z) ->
    #        lead + (n_z..n_x, l_z..l_x), both x-fastest on flatten
    permax = (tuple(range(nl))
              + tuple(nl + 2 * (d - 1 - k) for k in range(d))
              + tuple(nl + 2 * (d - 1 - k) + 1 for k in range(d)))
    u = u.transpose(permax)
    ne = int(np.prod(sm.dims))
    u = u.reshape(lead + (ne, (p + 1) ** d))
    if ident_e:
        return u
    return jnp.take(u, jnp.asarray(sm.e_raster_at_mesh), axis=-2)


def e_to_l_struct(u_e, sm: StructMaps):
    """E-vector (..., NE, (p+1)^d) -> assembled L-vector (..., ndof)."""
    p, d = sm.p, len(sm.dims)
    lead = u_e.shape[:-2]
    nl = len(lead)
    ne = int(np.prod(sm.dims))
    if (sm.e_mesh_at_raster == np.arange(ne)).all():
        u = u_e
    else:
        u = jnp.take(u_e, jnp.asarray(sm.e_mesh_at_raster), axis=-2)
    u = u.reshape(lead + tuple(sm.dims[::-1]) + tuple(
        p + 1 for _ in range(d)))
    # axes: lead + (n_z, n_y, n_x, l_z, l_y, l_x) -> interleave to
    #        lead + (n_x, l_x, n_y, l_y, n_z, l_z)
    permax = tuple(range(nl)) + sum(
        ((nl + (d - 1 - k), nl + d + (d - 1 - k)) for k in range(d)), ())
    u = u.transpose(permax)
    # step k (reverse order: z first) consumes the TRAILING (n_k, l_k)
    # pair and re-inserts the merged lattice axis at its home position
    for k in reversed(range(d)):
        u = _windows_t(u, sm.dims[k], p)
        u = jnp.moveaxis(u, -1, nl + (d - 1 - k))
    out = u.reshape(lead + (int(np.prod([n * p + 1 for n in sm.dims])),))
    return out if sm.identity_perm else out[..., jnp.asarray(sm.inv)]
