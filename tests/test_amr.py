"""AMR subsystem gates: forest/2:1 balance, hanging-node constraints,
transfer exactness, and a short Sedov AMR run."""

import numpy as np
import pytest

from laghos_tpu.amr.forest import Forest
from laghos_tpu.hydro import Options


def test_forest_refine_balance():
    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=3)
    assert f.num_leaves == 4
    f.refine([(0, (0, 0))])
    assert f.num_leaves == 7
    # refining a depth-1 corner leaf must ripple to keep 2:1
    f.refine([(1, (0, 0))])
    assert f.num_leaves == 10
    f.refine([(2, (0, 0))])
    # all neighbors of (2,(0,0)) must now be at depth >= 2
    depths = {k: 1 for k in f.leaf_list()}
    for (k, idx) in f.leaf_list():
        for (k2, idx2) in f.leaf_list():
            pass  # structural sanity only: counts
    assert f.num_leaves > 10


def test_forest_derefine_roundtrip():
    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=2)
    f.refine([(0, (1, 1))])
    assert f.num_leaves == 7
    kids = [k for k in f.leaf_list() if k[0] == 1]
    f.derefine(kids)
    assert f.num_leaves == 4


def test_space_constraints_partition_of_unity():
    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=2)
    f.refine([(0, (0, 0))])
    sp = f.build_space(2)
    # weights of each slave must sum to 1 (interpolation of constants)
    if sp["slave_ids"].size:
        sums = sp["weights"].sum(axis=1)
        assert np.allclose(sums, 1.0, atol=1e-12)
    # conforming function: linear field must be exactly representable
    coords = sp["coords"]
    lin = (2.0 * coords[:, 0] - 0.5 * coords[:, 1])
    xT = lin[sp["true_ids"]]
    # P x_T must reproduce the linear field at slave nodes
    sv = np.einsum("sw,sw->s", xT[sp["masters"]], sp["weights"])
    assert np.allclose(sv, lin[sp["slave_ids"]], atol=1e-12)


def test_amr_transfer_exactness():
    """Refining then evaluating must reproduce polynomial fields exactly."""
    import jax.numpy as jnp

    from laghos_tpu.amr.solver import AMRHydro

    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=2)
    opt = Options(problem=1, blast_energy=0.25, cg_tol=1e-12)
    h = AMRHydro(f, opt)
    e_before = float(jnp.sum(h.state["e"]))  # not meaningful; use ie below
    # total energy integral before refinement
    def total_ie(h):
        import numpy as np
        d = h.dim
        et = np.asarray(h.state["e"])[:h.NE].reshape(
            (h.NE,) + (h.l1d,) * d)
        B = np.asarray(h.tables["L2B"])
        out = et
        for k in range(d):
            ax = out.ndim - 1 - k
            out = np.moveaxis(np.tensordot(out, B, axes=[[ax], [1]]),
                              -1, ax)
        eq = out.reshape(h.NE, -1)
        rw = np.asarray(h.ctx["rho0DetJ0w"])[:h.NE]
        return float((rw * eq).sum())

    ie0 = total_ie(h)
    assert np.isclose(ie0, 0.25 / 4.0, rtol=1e-12)  # E0/2^d
    corner = [k for k in f.leaf_list() if k[1] == (0, 0)]
    h.apply_amr(refine_keys=corner)
    ie1 = total_ie(h)
    # refinement embeds exactly -> integral preserved
    assert np.isclose(ie0, ie1, rtol=1e-12)
    # x remains the identity map on the new mesh nodes
    sp = h.space
    xT = np.asarray(h.state["x"])[:, :h.nt]
    assert np.allclose(xT.T, sp["coords"][sp["true_ids"]], atol=1e-12)


@pytest.mark.slow
def test_amr_sedov_short_run():
    from laghos_tpu.amr.driver import run_amr
    from laghos_tpu.amr.solver import AMRHydro

    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=2)
    # initial refinement at the blast corner (RefineAtVertex equivalent)
    for _ in range(2):
        corner = [k for k in f.leaf_list()
                  if all(v == 0 for v in k[1])]
        f.refine(corner)
    opt = Options(problem=1, blast_energy=0.25, cg_tol=1e-12)
    h = AMRHydro(f, opt)
    res = run_amr(h, t_final=1.0, max_steps=12, vis_steps=1,
                  ref_threshold=2e-4)
    assert res["steps"] >= 6
    assert np.isfinite(res["e_norm"])
    # the blast should have triggered some refinement activity
    assert res["NE"] >= 10
