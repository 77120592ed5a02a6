"""Batched parameter sweeps (laghos_tpu/batch.py): B independent runs
in one jitted program, members bit-equal to separate driver runs, batch
axis shardable over a device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from laghos_tpu import batch, driver
from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.hydro import Hydro, Options


def _h(blast=0.25):
    m = fmesh.uniform_refine(fmesh.cartesian(2, (2, 2), (1.0, 1.0)))
    return Hydro(m, Options(problem=1, blast_energy=blast, cg_tol=1e-12))


def test_sweep_members_match_separate_runs():
    h = _h(0.25)
    energies = [0.25, 0.5]
    Sb = batch.blast_states(h, energies)
    out = batch.sweep(h, Sb, t_final=0.1, max_steps=8)
    assert out["steps"].shape == (2,)
    for i, E in enumerate(energies):
        hi = _h(E)
        r = driver.run(hi, t_final=0.1, max_steps=8, verbose=False)
        assert int(out["steps"][i]) == r.steps
        assert np.isclose(float(out["t"][i]), float(r.t), rtol=1e-12)
        Si = {k: v[i] for k, v in out["S"].items()}
        assert np.isclose(float(hi.e_norm(Si)), float(hi.e_norm(r.S)),
                          rtol=1e-11)
        assert not bool(out["crashed"][i])
    # different energies genuinely diverge
    assert (float(jnp.abs(out["S"]["e"][0] - out["S"]["e"][1]).max())
            > 1e-3)


def test_sweep_sharded_matches_unsharded():
    h = _h()
    energies = [0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55]
    Sb = batch.blast_states(h, energies)
    o1 = batch.sweep(h, Sb, t_final=0.08, max_steps=5)
    oD = batch.sweep(h, Sb, t_final=0.08, max_steps=5,
                     n_devices=len(jax.devices()))
    assert np.array_equal(np.asarray(o1["steps"]), np.asarray(oD["steps"]))
    for k in ("x", "v", "e"):
        a, b = np.asarray(o1["S"][k]), np.asarray(oD["S"][k])
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 1e-12
