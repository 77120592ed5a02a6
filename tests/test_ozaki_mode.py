"""Ozaki (int8-MXU) f64 production mode: parity with the plain f64 path.

The mode reroutes every hot contraction (CG mass applies, force pair,
qupdate interpolation) through integer-slice matmuls (ops/omm.py); on a
true-f64 host the products match the plain path to ~2^-50 relative, so
short trajectories must agree to ~1e-11 and golden-style step counts must
be unaffected.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu import driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options


def _pair(**kw):
    m = fmesh.cartesian(3, (2, 2, 2), (1.0, 1.0, 1.0))
    m = fmesh.uniform_refine(m)
    opt = dict(problem=1, blast_energy=2.0, ode_solver=4, cg_tol=1e-12)
    opt.update(kw)
    h0 = Hydro(m, Options(**opt))
    h1 = Hydro(m, Options(ozaki=True, **opt))
    return h0, h1


def test_mult_matches_plain_f64():
    h0, h1 = _pair()
    dS0, dt0, _ = h0._mult(h0.S0)
    dS1, dt1, _ = h1._mult(h1.S0)
    for k in ("x", "v", "e"):
        a, b = np.asarray(dS0[k]), np.asarray(dS1[k])
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-12, k
    assert abs(float(dt0) - float(dt1)) / float(dt0) < 1e-12


@pytest.mark.slow
def test_short_trajectory_matches():
    h0, h1 = _pair()
    r0 = driver.run(h0, t_final=0.6, max_steps=15, verbose=False)
    r1 = driver.run(h1, t_final=0.6, max_steps=15, verbose=False)
    assert r0.steps == r1.steps
    assert abs(r0.t - r1.t) / r0.t < 1e-11
    e0, e1 = h0.e_norm(r0.S), h1.e_norm(r1.S)
    assert abs(e0 - e1) / e0 < 1e-11


def test_guards():
    m = fmesh.cartesian(2, (2, 2), (1.0, 1.0))
    with pytest.raises(ValueError):
        Hydro(m, Options(problem=1, ozaki=True))
