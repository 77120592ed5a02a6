"""AMR golden runner (amr/README.md:98-103 table).

Run 1: -p 1 -m square01_quad.mesh -rs 4 -tf 0.8 -amr
       -> step 2374, dt 0.000308, |e| 90.9397751791
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("CHK_PLATFORM", "cpu"))

from laghos_tpu.amr.driver import run_amr
from laghos_tpu.amr.forest import Forest
from laghos_tpu.amr.solver import AMRHydro
from laghos_tpu.hydro import Options

ROWS = {
    1: {"rs": 4, "tf": 0.8, "ok": 2, "ot": 1, "rt": 2e-4, "dim": 2,
        "ref": (2374, 0.000308, 90.9397751791)},
    2: {"rs": 4, "tf": 0.8, "ok": 3, "ot": 2, "rt": 2e-4, "dim": 2,
        "ref": (2727, 0.000458, 168.0063715464)},
    3: {"rs": 3, "tf": 0.6, "ok": 2, "ot": 1, "rt": 2e-4, "dim": 3,
        "ref": (998, 0.001262, 388.6322346715)},
    4: {"rs": 4, "tf": 0.6, "ok": 2, "ot": 1, "rt": 1e-3, "dim": 3,
        "ref": (2463, 0.000113, 1703.2772575684)},
}


class _FlushingTrace(list):
    """Trace list that checkpoints itself to disk every N appends, so
    partial trajectories survive interrupted runs (1-CPU bisection)."""

    def __init__(self, path, every=200):
        super().__init__()
        self.path, self.every = path, every

    def append(self, rec):
        super().append(rec)
        if len(self) % self.every == 0:
            import json
            with open(self.path, "w") as fp:
                json.dump(list(self), fp)


def main(row=1, max_steps=-1):
    cfg = ROWS[row]
    dim = cfg["dim"]
    opt = Options(problem=1, blast_energy=0.25, order_v=cfg["ok"],
                  order_e=cfg["ot"], cg_tol=1e-8)
    tpath = os.environ.get("AMR_TRACE_PATH",
                           f"/tmp/amr_trace_row{row}.json")
    cpath = os.environ.get("AMR_CKPT_PATH",
                           f"/tmp/amr_ckpt_row{row}.pkl")
    trace = _FlushingTrace(tpath)
    resume = None
    if os.path.exists(cpath) and os.environ.get("AMR_RESUME", "1") == "1":
        from laghos_tpu.amr.driver import load_checkpoint, resume_amr_hydro
        resume = load_checkpoint(cpath)
        h = resume_amr_hydro(resume, opt)
        trace.extend(resume.get("trace") or [])
        print(f"resumed row {row} at step {resume['ti'] - 1}, "
              f"t={resume['t']:.4f}, NE={h.NE}")
    else:
        f = Forest(dim, (2,) * dim, (1.0,) * dim, max_depth=cfg["rs"])
        # initial RefineAtVertex at the blast corner, rs times
        # (amr/laghos.cpp:199-209)
        # RefineAtVertex does NOT enforce 2:1 (no nc_limit): the initial
        # mesh has depth-rs cells directly neighbouring depth-0 cells
        for _ in range(cfg["rs"]):
            corner = [k for k in f.leaf_list()
                      if all(v == 0 for v in k[1])]
            f.refine(corner, balance=False)
        # the reference driver hard-sets h0 = 0.5 / order_v via SetH0
        # (amr/laghos.cpp: elem_size = 0.5), overriding the mesh formula
        h = AMRHydro(f, opt, h0=0.5 / cfg["ok"])
        print(f"initial leaves: {h.NE}")
    res = run_amr(h, t_final=cfg["tf"], ref_threshold=cfg["rt"],
                  max_steps=max_steps, vis_steps=25, verbose=True,
                  trace=trace, ckpt_path=cpath,
                  ckpt_every=int(os.environ.get("AMR_CKPT_EVERY", "50")),
                  resume=resume)
    import json
    with open(tpath, "w") as fp:
        json.dump(list(trace), fp)
    step, dt, norm = cfg["ref"]
    rel = abs(res["e_norm"] - norm) / norm
    print(f"AMR row {row}: steps {res['steps']} (ref {step}), "
          f"dt {res['dt']:.6f} (ref {dt}), |e| {res['e_norm']:.10f} "
          f"(ref {norm}, rel {rel:.2e}), NE_final {res['NE']}")


if __name__ == "__main__":
    row = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    ms = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    main(row, ms)
