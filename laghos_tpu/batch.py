"""Batched parameter sweeps: B independent runs in ONE jitted program.

The reference runs parameter studies (blast energy, CFL, resolution
ladders) as separate MPI jobs.  The TPU-native equivalent batches the
member axis: the full adaptive-dt control flow (hydro.segment_loop,
laghos.cpp:741-790) is vmapped over a leading batch axis and the batch
axis is sharded over a 1D device mesh — an embarrassingly-parallel
sweep becomes one SPMD program with zero cross-member communication,
one compile, and one host sync at the end.  Members finish at their own
step counts (vmap masks finished members until the last one is done).

Use `sweep` with any batched initial-state pytree; `blast_states` is a
helper for the common Sedov blast-energy study (p1-style delta ICs are
linear in the blast energy, laghos.cpp:600-624).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hydro import segment_loop


def blast_states(hydro, energies) -> dict:
    """Batch of initial states for a blast-energy sweep.

    Valid for delta-IC problems whose background internal energy is
    zero (Sedov p1: rho0 = 1, e0 = blast delta only) — the L2 energy
    dofs are then LINEAR in the blast energy, so members are exact
    rescalings of the base IC.  hydro.opt.blast_energy is the base."""
    e0 = jnp.asarray(energies, hydro.dtype) / float(hydro.opt.blast_energy)
    B = e0.shape[0]
    tile = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)  # noqa: E731
    return {
        "x": tile(hydro.S0["x"]),
        "v": tile(hydro.S0["v"]),
        "e": hydro.S0["e"][None] * e0[:, None, None],
    }


def sweep(hydro, S_batch, t_final, *, max_steps=-1, n_devices=None):
    """Run every member of `S_batch` (leading axis B) to `t_final` in
    one jitted program; returns {"S", "t", "dt", "steps", "crashed"}
    with a leading B axis.

    With `n_devices`, the batch axis is sharded over a 1D device mesh
    ("sweep") — members run concurrently on separate chips with no
    collectives between them (B must be a multiple of n_devices for an
    even split; GSPMD pads otherwise)."""
    B = S_batch["e"].shape[0]
    dtype = hydro.dtype

    if n_devices is not None:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("sweep",))
        put = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P(*(("sweep",) + (None,) *
                                       (a.ndim - 1)))))
        S_batch = {k: put(v) for k, v in S_batch.items()}

    def prog(ctx, Sb):
        with hydro._bind_ctx(ctx):
            def one(S):
                sj, dt0 = hydro._qupdate(S)
                dt0 = hydro._guard_finite(S, dt0)
                out = segment_loop(
                    hydro._qupdate,
                    lambda Sc, dt_eff, sJ1: hydro._step(
                        Sc, dt_eff, True, sJit1=sJ1),
                    hydro._guard_finite, dtype,
                    S, jnp.asarray(0.0, dtype), dt0, jnp.asarray(1),
                    jnp.asarray(0), sj, jnp.bool_(False),
                    jnp.asarray(t_final, dtype), jnp.asarray(max_steps),
                    # no vis pauses inside a sweep; no check pauses
                    jnp.asarray(2 ** 30), jnp.asarray([-1], jnp.int32))
                (S2, t2, dt2, ti2, steps2, sj2, cs12, done, crashed,
                 h1a, l2a, pause) = out
                return {"S": S2, "t": t2, "dt": dt2, "steps": steps2,
                        "crashed": crashed, "h1_iters": h1a,
                        "l2_iters": l2a}

            return jax.vmap(one)(Sb)

    return jax.jit(prog)(hydro._ctx(), S_batch)
