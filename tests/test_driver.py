"""Driver-level gates: a reference --checks golden, checkpoint/resume,
multi-device dry run (SURVEY §4: rank-count invariance analog)."""

import os

import numpy as np
import pytest

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu import driver


def _sedov_2d_hydro(**kw):
    m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    opt = Options(problem=1, cg_tol=1e-14, **kw)
    return Hydro(m, opt)


def test_golden_sedov_2d_checks():
    """Reference --checks gate: |e| at steps 5 and 15 to 1e-13
    (laghos.cpp:1446 row p1/2D)."""
    h = _sedov_2d_hydro()
    res = driver.run(h, t_final=0.6, max_steps=60, vis_steps=1,
                     check_steps=(5, 15))
    assert abs(res.norms[5] - 3.508254945225794e+00) / 3.5 < 1e-13
    assert abs(res.norms[15] - 2.756444596823211e+00) / 2.75 < 1e-13


def test_checkpoint_resume(tmp_path):
    from laghos_tpu import checkpoint

    h = _sedov_2d_hydro()
    saved = {}

    def on_vis(ti, t, S):
        saved[ti] = True

    res_full = driver.run(h, t_final=0.6, max_steps=10, vis_steps=1,
                          checkpoint_path=str(tmp_path / "ck.npz"))
    # restore the final checkpoint and continue to t_final? just verify
    # the snapshot round-trips exactly
    S, t, dt, step = checkpoint.load(str(tmp_path / "ck.npz"))
    assert t == res_full.t and step == res_full.steps
    np.testing.assert_array_equal(np.asarray(S["e"]),
                                  np.asarray(res_full.S["e"]))


def test_resume_matches_uninterrupted(tmp_path):
    from laghos_tpu import checkpoint

    h = _sedov_2d_hydro()
    res10 = driver.run(h, t_final=0.6, max_steps=10, vis_steps=1,
                       checkpoint_path=str(tmp_path / "ck.npz"))
    S, t, dt, step = checkpoint.load(str(tmp_path / "ck.npz"))
    res_resume = driver.run(h, t_final=0.6, max_steps=5, vis_steps=1,
                            S_init=S, t_init=t, dt_init=dt,
                            step_init=step + 1)
    res15 = driver.run(h, t_final=0.6, max_steps=15, vis_steps=1)
    assert abs(res_resume.e_norm - res15.e_norm) < 1e-12


@pytest.mark.slow
def test_dryrun_multichip_8():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_device_count_invariance():
    """The goldens must be independent of the device count (README.md:249:
    same results for any number of ranks)."""
    import jax

    from laghos_tpu.parallel.sharding import device_mesh, shard_hydro

    m = fmesh.cartesian(2, (4, 2), (1.0, 1.0))
    h1 = Hydro(m, Options(problem=1, cg_tol=1e-14))
    r1 = driver.run(h1, t_final=0.6, max_steps=5, vis_steps=1)

    m2 = fmesh.cartesian(2, (4, 2), (1.0, 1.0))
    h8 = Hydro(m2, Options(problem=1, cg_tol=1e-14))
    shard_hydro(h8, device_mesh(8))
    r8 = driver.run(h8, t_final=0.6, max_steps=5, vis_steps=1)
    assert abs(r1.e_norm - r8.e_norm) / r1.e_norm < 1e-13


def test_device_loop_matches_host_loop():
    """The on-device adaptive-dt loop (Hydro.run_segment) must reproduce
    the host control loop exactly: step count, |e|, norm sampling steps,
    and CG iteration totals."""
    from laghos_tpu import driver
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options

    def mk():
        m = fmesh.cartesian(2, (2, 2), (1.0, 1.0))
        for _ in range(2):
            m = fmesh.uniform_refine(m)
        return Hydro(m, Options(problem=1, blast_energy=1.0))

    r1 = driver.run(mk(), t_final=0.1, vis_steps=7, verbose=False)
    r2 = driver.run(mk(), t_final=0.1, vis_steps=7, verbose=False,
                    device_loop=True)
    assert r1.steps == r2.steps
    assert abs(r1.t - r2.t) < 1e-15
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-14
    assert sorted(r1.norms) == sorted(r2.norms)
    assert r1.h1_iters == r2.h1_iters
