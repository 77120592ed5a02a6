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
):
    """Returns the run summary; with `trace` a list, appends one record
    per step ({ti, t, dt, NE, and refine/deref/reject events}) — the
    step-indexed trajectory used to localize divergence against
    reference runs (amr/README.md validation)."""
    t = 0.0
    S = hydro.state
    _, dt0, _ = hydro._qupdate(hydro.ctx, S)
    dt = float(dt0)
    last_step = False
    steps = 0
    count_stage1 = False
    ti = 1
    norms = {}
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

    return {"steps": ti - 1, "t": t, "dt": dt, "e_norm": hydro.e_norm(),
            "norms": norms, "NE": hydro.NE}
