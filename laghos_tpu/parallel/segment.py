"""On-device adaptive-dt segments for the distributed wrappers.

Builds the shard_map form of `hydro.segment_loop` for SlabHydro (slab
and pencil meshes) and ChunkHydro: the whole accept/reject/grow dt
control flow runs inside ONE jitted SPMD program, so a multi-chip run
syncs the host once per vis/checkpoint pause instead of once per step
(~25 ms tunnel latency each; reference driver loop laghos.cpp:741-790).
Every control scalar (dt estimate, finite guard, iteration counts) is
psum/pmin-reduced and therefore replicated — all devices take identical
branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..hydro import segment_loop


def _axis_names(sh):
    return getattr(sh, "names", None) or ("dd",)


def build_segment(sh):
    """Compile the distributed segment program for a SlabHydro or
    ChunkHydro `sh` (duck-typed: needs mesh/_spec/_local_ops/_consts
    and the parent Hydro at sh.h)."""
    h = sh.h
    names = _axis_names(sh)
    sp = sh._spec if hasattr(sh, "_spec") else P(names)
    n_c = len(sh._consts())

    def prog(S, t, dt, ti, steps, sj, cs1, tf, ms, vs, chk, *cc):
        cl = [c[0] for c in cc]
        ops = sh._local_ops(cl)
        Sl = {k: v[0] for k, v in S.items()}
        sjl = (tuple(a[0] for a in sj) if isinstance(sj, tuple)
               else sj[0])
        warm = {} if h.opt.cg_warm_start else None

        def mult(Sc, sJit=None):
            if sJit is None:
                sJit, dtm = ops["qupd"](Sc)
            else:
                dtm = jnp.asarray(jnp.inf, sh.dtype)
            x0v = warm.get("dv") if warm is not None else None
            x0e = warm.get("de") if warm is not None else None
            dv, h1it = ops["solve_velocity"](sJit, x0=x0v)
            de, l2it = ops["solve_energy"](Sc, sJit, Sc["v"], x0=x0e)
            if warm is not None:
                warm["dv"], warm["de"] = dv, de
            return {"x": Sc["v"], "v": dv, "e": de}, dtm, (h1it, l2it)

        def step(Sc, dt_eff, sJ1):
            first = [sJ1]

            def rk2avg_stage(Scur, v0, dtt):
                if first[0] is not None:
                    sJit = first[0]
                    dtm = jnp.asarray(jnp.inf, sh.dtype)
                    first[0] = None
                else:
                    sJit, dtm = ops["qupd"](Scur)
                x0v = warm.get("dv") if warm is not None else None
                x0e = warm.get("de") if warm is not None else None
                dv, h1it = ops["solve_velocity"](sJit, x0=x0v)
                V = v0 + 0.5 * dtt * dv
                de, l2it = ops["solve_energy"](Scur, sJit, V, x0=x0e)
                if warm is not None:
                    warm["dv"], warm["de"] = dv, de
                return {"x": V, "v": dv, "e": de}, dtm, (h1it, l2it)

            return h._step(Sc, dt_eff, True, mult=mult,
                           rk2avg_stage=rk2avg_stage,
                           mult1=lambda Sc2: mult(Sc2, sJ1))

        def guard(S_new, dt_est):
            loc = (jnp.sum(S_new["v"]) + jnp.sum(S_new["e"])
                   + jnp.sum(S_new["x"]))
            ok = jnp.isfinite(jax.lax.psum(loc, names))
            return jnp.where(ok, dt_est, 0.0)

        out = segment_loop(ops["qupd"], step, guard, sh.dtype,
                           Sl, t, dt, ti, steps, sjl, cs1, tf, ms, vs,
                           chk)
        (S2, t2, dt2, ti2, steps2, sj2, cs12, done, crashed, h1a, l2a,
         pause) = out
        S_out = {k: v[None] for k, v in S2.items()}
        sj_out = (tuple(a[None] for a in sj2)
                  if isinstance(sj2, tuple) else sj2[None])
        return (S_out, t2, dt2, ti2, steps2, sj_out, cs12, done,
                crashed, h1a, l2a, pause)

    in_specs = ((sp,) + (P(),) * 4 + (sp,) + (P(),) * 5 + (sp,) * n_c)
    out_specs = ((sp,) + (P(),) * 4 + (sp,) + (P(),) * 6)
    return jax.jit(shard_map(prog, mesh=sh.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False))


def run_segment(sh, S, t, dt, ti, steps, sj, count_stage1, t_final,
                max_steps, vis_steps, chk):
    """Driver-facing entry matching Hydro.run_segment."""
    if getattr(sh, "_segment_prog", None) is None:
        sh._segment_prog = build_segment(sh)
    dtype = sh.dtype
    return sh._segment_prog(
        S, jnp.asarray(t, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(ti), jnp.asarray(steps), sj,
        jnp.bool_(count_stage1), jnp.asarray(t_final, dtype),
        jnp.asarray(max_steps), jnp.asarray(vis_steps),
        jnp.asarray(chk, dtype=jnp.int32), *sh._consts())
