"""Generic owned-dof halo layout for slab domain decompositions.

The PRODUCTION multi-chip mode is `parallel/slab_hydro.py` (structured
plane-slice halos with identity local transforms).  This module keeps
the generic dof-ownership layout (owned/ghost partition, exchange plan,
global gather/scatter) that an UNSTRUCTURED-mesh halo build uses; the
communication pattern is the same either way:

  * a `ppermute` exchange of interface-dof contributions after each H1
    scatter-add (the reference's MPI halo exchange through the
    prolongation, laghos_solver.cpp:362-398),
  * `psum` for CG dot products / energy integrals,
  * `pmin` for the dt estimate (laghos_solver.cpp:527-535).

All index plumbing is built once on the host; inside `shard_map` the
whole RK step (including the CG while_loops) is a single program per
device with two nearest-neighbor sends per operator apply — O(surface)
communication riding ICI, matching the reference's scaling structure.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@dataclasses.dataclass
class HaloLayout:
    """Per-device local numbering + exchange plan (host-built, static)."""

    D: int
    ne_loc: int               # padded elements per device
    nloc: int                 # padded local dofs per device (+1 dead slot)
    gather: np.ndarray        # (D, ne_loc, nd) local dof ids
    elem_valid: np.ndarray    # (D, ne_loc) bool
    owned: np.ndarray         # (D, nloc) float (1 = owned)
    ess: np.ndarray           # (D, dim, nloc) bool
    send_next: np.ndarray     # (D, H) local ids to send to device k+1
    recv_prev: np.ndarray     # (D, H) local ids receiving from k-1
    send_prev: np.ndarray     # (D, H)
    recv_next: np.ndarray     # (D, H)
    loc_of_glob: list         # per device dict-like arrays for transfers
    glob_of_loc: np.ndarray   # (D, nloc) global dof id (-1 for dead)


def build_layout(space, D: int) -> HaloLayout:
    """Partition the element axis of a conforming H1 space into D slabs."""
    g = space.gather                      # (NE, nd) global ids
    NE, nd = g.shape
    dim = space.mesh.dim
    ne_loc = -(-NE // D)
    ess_g = np.stack([space.ess_mask(c) for c in range(dim)])

    loc_gather = np.zeros((D, ne_loc, nd), dtype=np.int32)
    elem_valid = np.zeros((D, ne_loc), dtype=bool)
    glob_sets = []
    for k in range(D):
        lo, hi = k * ne_loc, min((k + 1) * ne_loc, NE)
        dofs = np.unique(g[lo:hi].reshape(-1))
        glob_sets.append(dofs)
    nloc = max(s.size for s in glob_sets) + 1      # +1 dead slot

    owned = np.zeros((D, nloc))
    ess = np.zeros((D, dim, nloc), dtype=bool)
    glob_of_loc = np.full((D, nloc), -1, dtype=np.int64)
    first_owner = np.full(space.ndof, -1, dtype=np.int64)
    for k in range(D):
        for dof in glob_sets[k]:
            if first_owner[dof] < 0:
                first_owner[dof] = k
    for k in range(D):
        dofs = glob_sets[k]
        pos = {int(dd): i for i, dd in enumerate(dofs)}
        lo, hi = k * ne_loc, min((k + 1) * ne_loc, NE)
        for li, e in enumerate(range(lo, hi)):
            loc_gather[k, li] = [pos[int(x)] for x in g[e]]
            elem_valid[k, li] = True
        # invalid elements gather from the dead slot
        loc_gather[k, hi - lo:] = nloc - 1
        glob_of_loc[k, :dofs.size] = dofs
        owned[k, :dofs.size] = (first_owner[dofs] == k).astype(np.float64)
        ess[k, :, :dofs.size] = ess_g[:, dofs]

    # The exchange plan only covers adjacent slabs (k, k+1).  If a slab is
    # thinner than one raster element layer, a dof can be shared by
    # NON-adjacent slabs and its contributions would silently be dropped —
    # fail loudly instead (use fewer devices or a coarser partition).
    for k in range(D):
        for j in range(k + 2, D):
            far = np.intersect1d(glob_sets[k], glob_sets[j])
            if far.size:
                raise ValueError(
                    f"halo layout: {far.size} dofs shared between "
                    f"non-adjacent slabs {k} and {j}; slabs must be at "
                    f"least one element layer thick (reduce device count)")

    H = 1
    pairs = []
    for k in range(D - 1):
        shared = np.intersect1d(glob_sets[k], glob_sets[k + 1])
        pairs.append(shared)
        H = max(H, shared.size)
    send_next = np.full((D, H), nloc - 1, dtype=np.int32)
    recv_prev = np.full((D, H), nloc - 1, dtype=np.int32)
    send_prev = np.full((D, H), nloc - 1, dtype=np.int32)
    recv_next = np.full((D, H), nloc - 1, dtype=np.int32)
    for k in range(D - 1):
        shared = pairs[k]
        pos_k = {int(dd): i for i, dd in enumerate(glob_sets[k])}
        pos_k1 = {int(dd): i for i, dd in enumerate(glob_sets[k + 1])}
        idx_k = np.array([pos_k[int(x)] for x in shared], dtype=np.int32)
        idx_k1 = np.array([pos_k1[int(x)] for x in shared], dtype=np.int32)
        send_next[k, :shared.size] = idx_k
        recv_prev[k + 1, :shared.size] = idx_k1
        send_prev[k + 1, :shared.size] = idx_k1
        recv_next[k, :shared.size] = idx_k

    return HaloLayout(D, ne_loc, nloc, loc_gather, elem_valid, owned, ess,
                      send_next, recv_prev, send_prev, recv_next,
                      glob_sets, glob_of_loc)


def scatter_global(layout: HaloLayout, u_glob: np.ndarray) -> np.ndarray:
    """Global (C, ndof) -> per-device local (D, C, nloc) (replicating
    interface dofs)."""
    C = u_glob.shape[0]
    out = np.zeros((layout.D, C, layout.nloc))
    for k in range(layout.D):
        dofs = layout.loc_of_glob[k]
        out[k, :, :dofs.size] = u_glob[:, dofs]
    return out


def gather_global(layout: HaloLayout, u_loc: np.ndarray, ndof: int):
    """Per-device local (D, C, nloc) -> global (C, ndof) (owned writes)."""
    C = u_loc.shape[1]
    out = np.zeros((C, ndof))
    for k in range(layout.D):
        dofs = layout.loc_of_glob[k]
        own = layout.owned[k, :dofs.size] > 0
        out[:, dofs[own]] = u_loc[k][:, :dofs.size][:, own]
    return out


def halo_exchange_add(y, idx, axis="dd"):
    """Inside shard_map: bidirectional halo assembly — add neighbor
    interface contributions.  Both directions read the ORIGINAL (local)
    contributions so nothing double-counts.

    y: (C, nloc) local assembled values (this device's contributions only).
    idx: (send_next, recv_prev, send_prev, recv_next) local index arrays.
    """
    send_next, recv_prev, send_prev, recv_next = idx
    D = jax.lax.axis_size(axis)
    if D == 1:
        return y
    up = [(i, i + 1) for i in range(D - 1)]
    down = [(i + 1, i) for i in range(D - 1)]
    a = y[:, send_next]
    c = y[:, send_prev]
    from_prev = jax.lax.ppermute(a, axis, up)
    from_next = jax.lax.ppermute(c, axis, down)
    y = y.at[:, recv_prev].add(from_prev)
    y = y.at[:, recv_next].add(from_next)
    return y
