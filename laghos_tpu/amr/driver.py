"""AMR time loop: adaptive dt + per-step refine/derefine decisions.

Mirrors the reference AMR driver (amr/laghos.cpp:628-719):
  * refine where zone-max viscosity > ref_threshold, depth < max level,
    and the zone is still (min velocity < 1e-3) or ti < 50,
  * otherwise derefine post-shock zones by per-zone max density below
    deref_threshold * global max, protecting the blast region and zones
    not yet in motion,
  * on any change: transfer state, rebuild operators, continue.
"""

from __future__ import annotations

import numpy as np

from .solver import AMRHydro


def run_amr(
    hydro: AMRHydro,
    t_final: float,
    ref_threshold: float = 2e-4,
    deref_threshold: float = 0.75,
    max_steps: int = -1,
    vis_steps: int = 5,
    verbose: bool = False,
    blast_position=(0.0, 0.0, 0.0),
    blast_amr_size: float = 1e-10,
    trace: list | None = None,
    ckpt_path: str | None = None,
    ckpt_every: int = 100,
    resume: dict | None = None,
):
    """Returns the run summary; with `trace` a list, appends one record
    per step ({ti, t, dt, NE, and refine/deref/reject events}) — the
    step-indexed trajectory used to localize divergence against
    reference runs (amr/README.md validation).

    With `ckpt_path`, a resumable checkpoint (forest leaves + x0_T +
    state + loop counters) is written atomically every `ckpt_every`
    accepted steps; pass a loaded checkpoint as `resume` (with a hydro
    built via `resume_amr_hydro`) to continue a run bit-identically —
    multi-thousand-step golden rows survive 1-CPU session limits."""
    if resume is not None:
        t = float(resume["t"])
        dt = float(resume["dt"])
        steps = int(resume["steps"])
        ti = int(resume["ti"])
        count_stage1 = bool(resume["count_stage1"])
        norms = {int(k): float(v) for k, v in resume["norms"].items()}
        S = hydro.state
    else:
        t = 0.0
        S = hydro.state
        _, dt0, _ = hydro._qupdate(hydro.ctx, S)
        dt = float(dt0)
        steps = 0
        count_stage1 = False
        ti = 1
        norms = {}
    last_step = False
    while not last_step:
        if t + dt >= t_final:
            dt = t_final - t
            last_step = True
        if steps == max_steps:
            last_step = True
        S_old, t_old = S, t
        S_new, dt_est, visc_max, _ = hydro.advance(S, dt, count_stage1)
        count_stage1 = False
        steps += 1
        dt_est = float(dt_est)
        if dt_est < dt:
            dt *= 0.85
            if dt < np.finfo(np.float64).eps:
                raise RuntimeError("The time step crashed!")
            S, t = S_old, t_old
            count_stage1 = True     # ResetQuadratureData: stage 1 will
            if steps < max_steps:   # recompute and count in dt_est
                last_step = False
            if trace is not None:
                trace.append({"ti": ti, "event": "reject", "dt": dt,
                              "NE": hydro.NE})
            continue
        S = S_new
        t += dt
        if dt_est > 1.25 * dt:
            dt *= 1.02

        hydro.state = S
        if last_step or ti % vis_steps == 0:
            en = hydro.e_norm()
            norms[ti] = en
            if verbose:
                print(f"step {ti:5d},\tt = {t:.4f},\tdt = {dt:.6f},"
                      f"\t|e| = {en:.10e}  NE={hydro.NE}")

        # ---- AMR block (amr/laghos.cpp:628-719) -------------------------
        est = np.asarray(visc_max)[:hydro.NE]
        # GetPerElementMinMax(v_gf): min/max of |v| at Gauss points of
        # order order_v + 1 (amr/laghos.cpp:631-633, 846-857)
        v_min, _ = hydro.v_min_max(S)
        order = hydro.forest.leaf_list()
        depths = hydro.forest.depths()
        refs = [order[i] for i in range(hydro.NE)
                if est[i] > ref_threshold
                and depths[i] < hydro.forest.max_depth
                and (v_min[i] < 1e-3 or ti < 50)]
        changed = False
        derefs = []
        if refs:
            changed = hydro.apply_amr(refine_keys=refs)
            # nc_limit=1 is enforced globally on every refinement call
            # (MFEM LimitNCLevel); one level per pass, transfers chained
            while changed:
                viol = hydro.forest.balance_violations(1)
                if not viol:
                    break
                hydro.apply_amr(refine_keys=viol)
            if changed and verbose:
                print(f"Refined {len(refs)} -> {hydro.NE} elements.")
        elif deref_threshold:
            # DerefineByError(rho_max, threshold, nc_limit, op=max) with
            # rho_max = per-zone max of the projected density at Gauss
            # points (amr/laghos.cpp:663-698)
            rho_max = hydro.rho_max(S)
            threshold = deref_threshold * rho_max.max()
            protect = rho_max.copy()
            # blast protection: elements with a (deformed) corner vertex
            # within blast_amr_size of the blast position
            # (FindElementsWithVertex, amr/laghos.cpp:674-683)
            protect[hydro.elements_with_vertex(
                S, blast_position, blast_amr_size)] = 1e10
            # only derefine where the mesh is in motion (post-shock)
            protect[v_min < 0.1] = 1e10
            derefs = [order[i] for i in range(hydro.NE)
                      if protect[i] < threshold]
            if derefs:
                changed = hydro.apply_amr(deref_keys=derefs)
                if changed and verbose:
                    print(f"Derefined -> {hydro.NE} elements.")
        if changed:
            S = hydro.state
            count_stage1 = True     # AMRUpdate invalidates quad data
        if trace is not None:
            trace.append({
                "ti": ti, "t": t, "dt": dt, "NE": hydro.NE,
                "e_norm": hydro.e_norm(), "n_ref": len(refs),
                "n_deref": len(derefs), "changed": bool(changed)})
        ti += 1
        if (ckpt_path is not None and not last_step
                and (ti - 1) % ckpt_every == 0):
            save_checkpoint(ckpt_path, hydro, t, dt, steps, ti,
                            count_stage1, norms, trace)

    if ckpt_path is not None and t < t_final - 1e-14:
        # run ended by max_steps, not t_final: leave a resume point
        save_checkpoint(ckpt_path, hydro, t, dt, steps, ti,
                        count_stage1, norms, trace)
    return {"steps": ti - 1, "t": t, "dt": dt, "e_norm": hydro.e_norm(),
            "norms": norms, "NE": hydro.NE}


def save_checkpoint(path, hydro, t, dt, steps, ti, count_stage1, norms,
                    trace=None):
    """Atomically write a resumable AMR run checkpoint."""
    import pickle

    f = hydro.forest
    ck = {
        "forest": {"dim": f.dim, "base_n": f.base_n, "sizes": f.sizes,
                   "max_depth": f.max_depth, "leaves": list(f.leaf_list())},
        "x0_T": np.asarray(hydro.x0_T, np.float64),
        "h0": float(hydro._h0),
        "xT": np.asarray(hydro.state["x"], np.float64)[:, :hydro.nt],
        "vT": np.asarray(hydro.state["v"], np.float64)[:, :hydro.nt],
        "e": np.asarray(hydro.state["e"], np.float64)[:hydro.NE],
        "t": t, "dt": dt, "steps": steps, "ti": ti,
        "count_stage1": count_stage1, "norms": dict(norms),
    }
    if trace is not None:
        ck["trace"] = list(trace)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        pickle.dump(ck, fp)
    import os

    os.replace(tmp, path)


def load_checkpoint(path):
    import pickle

    with open(path, "rb") as fp:
        return pickle.load(fp)


def resume_amr_hydro(ck, opt, dtype=None):
    """Rebuild the AMRHydro a checkpoint was taken from."""
    import jax.numpy as jnp

    from .forest import Forest

    f = Forest.from_leaves(**ck["forest"])
    return AMRHydro(f, opt, dtype=dtype or jnp.float64, ckpt=ck)
