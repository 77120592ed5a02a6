"""Domain decomposition over a TPU device mesh.

The reference's only distributed strategy is SPMD domain decomposition of
the element set over MPI ranks with halo exchange of shared H1 dofs and
allreduce scalars (SURVEY §2.4.1, §2.5).  The TPU-native equivalent here:

  * a 1D `jax.sharding.Mesh` with axis "dd",
  * every element-batched array (leading NE axis) sharded over "dd",
  * H1 L-vectors sharded over the dof axis,
  * the gather/scatter between them compiled by GSPMD into the
    appropriate collectives (the halo exchange), and CG dot products /
    dt-min reductions becoming cross-device psum/pmin automatically.

Because the whole step is one jitted program, XLA sees the full
computation and fuses/overlaps communication — no hand-written MPI
schedule to replicate.  (A shard_map + ppermute structured-halo variant is
the planned performance upgrade once profiles justify it.)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dd",))


def shard_hydro(hydro, mesh: Mesh):
    """Re-place a Hydro instance's arrays over the device mesh in-place.

    Element-batched data shards over "dd"; basis tables and small vectors
    replicate; H1 L-vectors shard on the dof axis.  Subsequent jitted
    calls compile as multi-device SPMD programs.
    """
    elem = NamedSharding(mesh, P("dd"))
    elem2 = NamedSharding(mesh, P("dd", None))
    elem3 = NamedSharding(mesh, P("dd", None, None))
    elem4 = NamedSharding(mesh, P("dd", None, None, None))
    repl = NamedSharding(mesh, P())
    # L-vectors replicate: dof counts are not device-divisible, and the
    # scatter-add from sharded element contributions onto a replicated
    # output compiles to exactly the all-reduce assembly the reference
    # performs through its prolongation halo exchanges.  (A shard_map +
    # ppermute surface-halo layout is the planned scaling upgrade.)
    lvec = repl
    dof = repl

    put = jax.device_put
    hydro.gather = put(hydro.gather, elem2)
    hydro.gamma_j = put(hydro.gamma_j, elem)
    hydro.rho0DetJ0w_j = put(hydro.rho0DetJ0w_j, elem2)
    hydro.Jac0inv_j = put(hydro.Jac0inv_j, elem4)
    hydro.massD = put(hydro.massD, elem2)
    hydro.one_l2 = put(hydro.one_l2, elem2)
    hydro.Me_inv = put(hydro.Me_inv, elem3)
    hydro.tables = {k: put(v, repl) for k, v in hydro.tables.items()}
    hydro.h1_dinv = put(hydro.h1_dinv, dof)
    hydro.ess_mask_j = put(hydro.ess_mask_j, lvec)
    if hydro.rt_rhs is not None:
        hydro.rt_rhs = put(hydro.rt_rhs, lvec)
    hydro.S0 = {
        "x": put(hydro.S0["x"], lvec),
        "v": put(hydro.S0["v"], lvec),
        "e": put(hydro.S0["e"], elem2),
    }
    if getattr(hydro, "Jac0inv9_j", None) is not None:
        hydro.Jac0inv9_j = tuple(
            put(a, elem2) for a in hydro.Jac0inv9_j)
    hydro.mesh_devices = mesh
    return hydro


def shard_amr(hydro, mesh: Mesh):
    """Distribute an AMRHydro over a device mesh (in-place).

    The TPU-native analog of the reference's ParNCMesh distribution +
    Rebalance() (amr/laghos.cpp:707): every capacity-padded
    element-batched ctx array shards over the element axis; node/true
    vectors replicate (hanging-node constraint applications and CG dots
    become cross-device collectives under GSPMD).  After every AMR
    event the rebuilt ctx is re-placed the same way — leaf order is the
    forest's deterministic (depth, index) order, so re-placement IS the
    load rebalance: each device always owns an equal contiguous chunk
    of the new element set.  (The reference's SFC ordering gives better
    surface-to-volume locality; with GSPMD the collective schedule is
    XLA's concern, and a Morton leaf order remains a locality upgrade.)

    Call once after construction; placement then persists across
    apply_amr() rebuilds via the _on_rebuild hook.
    """
    hydro.device_mesh = mesh
    hydro._on_rebuild = lambda: _place_amr_ctx(hydro, mesh)
    _place_amr_ctx(hydro, mesh)
    return hydro


def _place_amr_ctx(hydro, mesh: Mesh):
    elem = {1: NamedSharding(mesh, P("dd")),
            2: NamedSharding(mesh, P("dd", None)),
            3: NamedSharding(mesh, P("dd", None, None)),
            4: NamedSharding(mesh, P("dd", None, None, None))}
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    elem_axes = {"gather", "elem_valid", "rho0DetJ0w", "Jac0inv",
                 "massD", "Me_inv", "depths"}
    ctx = {}
    for k, v in hydro.ctx.items():
        if k in elem_axes:
            ctx[k] = put(v, elem[v.ndim])
        else:
            ctx[k] = put(v, repl)
    hydro.ctx = ctx
    hydro.tables = {k: put(v, repl) for k, v in hydro.tables.items()}
    if getattr(hydro, "state", None) is not None:
        # node vectors shard over the (capacity-padded) dof axis — the
        # analog of ParNCMesh's distributed true/node vectors
        # (amr/laghos.cpp:707): GSPMD turns the element gathers into
        # all-gathers and the CG dots into psums, and each device holds
        # only its dof chunk between steps.  GSPMD handles the uneven
        # last shard of non-divisible dof counts.
        dof = NamedSharding(mesh, P(None, "dd"))
        hydro.state = {
            "x": put(hydro.state["x"], dof),
            "v": put(hydro.state["v"], dof),
            "e": put(hydro.state["e"], elem[2]),
        }
