"""Time-integration driver: adaptive dt with step repetition.

Host-side control loop mirroring the reference's main loop
(laghos.cpp:741-920): jitted `advance` calls do all device work; only the
scalar dt control decisions live in Python, exactly as the reference keeps
them outside its device kernels.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import numpy as np

from .hydro import Hydro
from .timing import TimingData


@dataclasses.dataclass
class RunResult:
    steps: int
    t: float
    dt: float
    e_norm: float
    energy_init: float
    energy_final: float
    h1_iters: int
    l2_iters: int
    quad_steps: int
    norms: dict          # step -> |e| at the steps where it was sampled
    timings: dict
    timing_data: Optional[TimingData] = None
    S: Optional[dict] = None  # final state


def run(
    hydro: Hydro,
    t_final: float,
    max_steps: int = -1,
    vis_steps: int = 5,
    on_vis: Optional[Callable] = None,
    check_steps: tuple = (),
    verbose: bool = False,
    timing: bool = False,
    S_init=None,
    t_init: float = 0.0,
    dt_init: Optional[float] = None,
    step_init: int = 1,
    checkpoint_path: Optional[str] = None,
    device_loop: bool = False,
) -> RunResult:
    S = hydro.S0 if S_init is None else S_init
    ie, ke = hydro.energies(S)
    energy_init = float(ie) + float(ke)

    if device_loop:
        return _run_device_loop(
            hydro, S, energy_init, t_final, max_steps=max_steps,
            vis_steps=vis_steps, on_vis=on_vis, check_steps=check_steps,
            verbose=verbose, t_init=t_init, dt_init=dt_init,
            step_init=step_init, checkpoint_path=checkpoint_path)

    t = t_init
    if dt_init is not None:
        dt = dt_init
        sJit_prev = None
    else:
        dt0, sJit_prev = hydro.dt_estimate_full(S)
        dt = float(dt0)
    last_step = False
    steps = 0
    ti = step_init
    h1_iters = 0
    l2_iters = 0
    quad_steps = 0
    norms = {}
    tim = TimingData() if timing else None
    t0 = time.perf_counter()
    count_stage1 = False  # stage-1 qdata is memoized except after rollback

    while not last_step:
        if t + dt >= t_final:
            dt = t_final - t
            last_step = True
        if steps == max_steps:
            last_step = True
        S_old, t_old = S, t

        if timing:
            S_new, dt_est, (h1it, l2it), sJit_new = hydro.advance_timed(
                S, dt, tim, count_stage1, sJit1=sJit_prev)
        else:
            S_new, dt_est, (h1it, l2it), sJit_new = hydro.advance(
                S, dt, count_stage1, sJit1=sJit_prev)
        count_stage1 = False
        steps += 1
        dt_est = float(dt_est)

        if dt_est < dt:
            # Repeat with decreased dt (laghos.cpp:764-777)
            dt *= 0.85
            if dt < np.finfo(np.float64).eps:
                raise RuntimeError("The time step crashed!")
            t = t_old
            S = S_old
            count_stage1 = True
            sJit_prev = None  # qdata reset (laghos.cpp:773)
            if verbose:
                print(f"Repeating step {ti}")
            # faithful to laghos.cpp:775 (including max_tsteps = -1)
            if steps < max_steps:
                last_step = False
            continue
        S = S_new
        t += dt
        sJit_prev = sJit_new
        h1_iters += int(h1it)
        l2_iters += int(l2it)
        quad_steps += hydro.NE
        if dt_est > 1.25 * dt:
            dt *= 1.02

        if last_step or (ti % vis_steps) == 0 or ti in check_steps:
            en = hydro.e_norm(S)
            norms[ti] = en
            if verbose:
                print(f"step {ti:5d},\tt = {t:.4f},\tdt = {dt:.6f},"
                      f"\t|e| = {en:.10e}")
            if on_vis is not None:
                on_vis(ti, t, S)
            if checkpoint_path is not None:
                from . import checkpoint

                checkpoint.save(checkpoint_path, S, t, dt, ti)
        ti += 1

    wall = time.perf_counter() - t0
    ie, ke = hydro.energies(S)
    return RunResult(
        steps=ti - 1,
        t=t,
        dt=dt,
        e_norm=hydro.e_norm(S),
        energy_init=energy_init,
        energy_final=float(ie) + float(ke),
        h1_iters=h1_iters,
        l2_iters=l2_iters,
        quad_steps=quad_steps,
        norms=norms,
        timings={"total": wall},
        timing_data=tim,
        S=S,
    )


def _run_device_loop(
    hydro, S, energy_init, t_final, *, max_steps, vis_steps, on_vis,
    check_steps, verbose, t_init, dt_init, step_init, checkpoint_path,
) -> RunResult:
    """Adaptive-dt loop with the control flow ON DEVICE
    (Hydro.run_segment): one host sync per vis/checkpoint pause instead
    of per step.  Produces the same trajectory, step numbering, and
    printed lines as the host loop (bitwise-identical math; rejected
    steps are summarized per segment rather than printed live)."""
    import numpy as np

    t = t_init
    if dt_init is not None:
        dt = float(dt_init)
        sJit, _ = hydro._jq(S)          # rebuild memoized stage-1 qdata
        count_stage1 = True             # its dt must count on resume
    else:
        dt0, sJit = hydro.dt_estimate_full(S)
        dt = float(dt0)
        count_stage1 = False
    ti = step_init
    steps = 0
    h1_iters = 0
    l2_iters = 0
    norms = {}
    chk = np.asarray(sorted(check_steps) or [-1], dtype=np.int32)
    t0w = time.perf_counter()
    while True:
        (S, tj, dtj, tij, stepsj, sJit, cs1, done, crashed, h1a, l2a,
         _) = hydro.run_segment(
            S, t, dt, ti, steps, sJit, count_stage1, t_final,
            max_steps, vis_steps, chk)
        t, dt = float(tj), float(dtj)
        ti_new, steps = int(tij), int(stepsj)
        count_stage1 = bool(cs1)
        h1_iters += int(h1a)
        l2_iters += int(l2a)
        if bool(crashed):
            raise RuntimeError("The time step crashed!")
        paused_ti = ti_new - 1          # the accepted step that paused
        if ti_new > ti and (bool(done) or paused_ti % vis_steps == 0
                            or paused_ti in check_steps):
            en = hydro.e_norm(S)
            norms[paused_ti] = en
            if verbose:
                print(f"step {paused_ti:5d},\tt = {t:.4f},"
                      f"\tdt = {dt:.6f},\t|e| = {en:.10e}")
            if on_vis is not None:
                on_vis(paused_ti, t, S)
            if checkpoint_path is not None:
                from . import checkpoint

                checkpoint.save(checkpoint_path, S, t, dt, paused_ti)
        ti = ti_new
        if bool(done):
            break
    wall = time.perf_counter() - t0w
    ie, ke = hydro.energies(S)
    return RunResult(
        steps=ti - 1,
        t=t,
        dt=dt,
        e_norm=hydro.e_norm(S),
        energy_init=energy_init,
        energy_final=float(ie) + float(ke),
        h1_iters=h1_iters,
        l2_iters=l2_iters,
        quad_steps=(ti - 1) * hydro.NE,
        norms=norms,
        timings={"total": wall},
        timing_data=None,
        S=S,
    )
