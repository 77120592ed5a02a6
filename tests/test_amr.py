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
    assert f.num_leaves > 10
    # 2:1 invariant: no leaf may have a face neighbor more than one
    # level coarser
    assert f.balance_violations(1) == []


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


@pytest.mark.parametrize("order", [2, 3])
def test_space_constraints_3d_poly_exact(order):
    """3D hanging constraints (faces AND edge-diagonals) must reproduce
    any degree-p tensor polynomial from its true dofs — including on
    non-2:1 meshes (the reference's RefineAtVertex initial grading)."""
    f = Forest(3, (2, 2, 2), (1.0, 1.0, 1.0), max_depth=3)
    # graded corner chain, no balancing: depth-3 leaves meet depth-0/1
    # leaves across faces, edges, and corners
    for _ in range(3):
        corner = [k for k in f.leaf_list() if all(v == 0 for v in k[1])]
        f.refine(corner, balance=False)
    sp = f.build_space(order)
    if sp["slave_ids"].size:
        assert np.allclose(sp["weights"].sum(axis=1), 1.0, atol=1e-12)
    coords = sp["coords"]
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    # full degree-p tensor polynomial (exactly in the H1 space)
    poly = ((1.0 + 0.3 * x) ** order * (1.0 - 0.4 * y) ** order
            * (0.5 + 0.25 * z) ** order)
    xT = poly[sp["true_ids"]]
    sv = np.einsum("sw,sw->s", xT[sp["masters"]], sp["weights"])
    assert np.allclose(sv, poly[sp["slave_ids"]], atol=1e-11)
    # and a balanced (2:1) variant
    f2 = Forest(3, (2, 2, 2), (1.0, 1.0, 1.0), max_depth=2)
    f2.refine([(0, (0, 0, 0))])
    f2.refine([(1, (0, 0, 0))])
    sp2 = f2.build_space(order)
    coords = sp2["coords"]
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    poly = (x + 0.5) ** order * (y - 2.0) * (z + 0.25)
    xT = poly[sp2["true_ids"]]
    sv = np.einsum("sw,sw->s", xT[sp2["masters"]], sp2["weights"])
    assert np.allclose(sv, poly[sp2["slave_ids"]], atol=1e-11)


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
    # the AMR variant does NOT divide by 2^d (amr/laghos.cpp:417-421,
    # unlike main laghos.cpp:601-604): the delta integrates to E0
    assert np.isclose(ie0, 0.25, rtol=1e-12)
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
def test_amr_distributed_matches_single_device():
    """shard_amr over 8 virtual devices (GSPMD + per-event re-placement,
    the Rebalance equivalent) must reproduce the single-device AMR
    trajectory to roundoff."""
    from laghos_tpu.amr.driver import run_amr
    from laghos_tpu.amr.solver import AMRHydro
    from laghos_tpu.parallel.sharding import device_mesh, shard_amr

    def build():
        f = Forest(2, (2, 2), (1.0, 1.0), max_depth=2)
        for _ in range(2):
            corner = [k for k in f.leaf_list()
                      if all(v == 0 for v in k[1])]
            f.refine(corner, balance=False)
        opt = Options(problem=1, blast_energy=0.25, cg_tol=1e-12)
        return AMRHydro(f, opt, h0=0.25)

    h1 = build()
    r1 = run_amr(h1, t_final=1.0, max_steps=25, vis_steps=1000)
    h2 = build()
    shard_amr(h2, device_mesh(8))
    r2 = run_amr(h2, t_final=1.0, max_steps=25, vis_steps=1000)
    assert r1["steps"] == r2["steps"]
    assert r1["NE"] == r2["NE"]
    assert np.isclose(r1["e_norm"], r2["e_norm"], rtol=1e-12)


@pytest.mark.slow
def test_amr_golden_row1_prefix():
    """Numeric regression gate on the amr/README row-1 configuration
    (60-step prefix): reference-semantics driver (RefineAtVertex initial
    mesh, SetH0 0.5/ok, |v|-at-Gauss gates, vertex-radius blast
    protection, undivided blast energy).  Values are our own pinned
    trajectory — they catch ANY semantic drift in forest/solver/driver."""
    from laghos_tpu.amr.driver import run_amr
    from laghos_tpu.amr.solver import AMRHydro

    f = Forest(2, (2, 2), (1.0, 1.0), max_depth=4)
    for _ in range(4):
        corner = [k for k in f.leaf_list() if all(v == 0 for v in k[1])]
        f.refine(corner, balance=False)
    opt = Options(problem=1, blast_energy=0.25, order_v=2, order_e=1,
                  cg_tol=1e-8)
    h = AMRHydro(f, opt, h0=0.25)
    assert h.NE == 16
    res = run_amr(h, t_final=0.8, ref_threshold=2e-4, max_steps=60,
                  vis_steps=1000)
    assert res["steps"] == 51
    assert res["NE"] == 70
    assert np.isclose(res["e_norm"], 390.4794540789, rtol=1e-8)


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


def test_amr_checkpoint_resume_bit_identical(tmp_path):
    """A run interrupted at step K and resumed from its checkpoint must
    reproduce the straight run exactly (same steps, same trace, same
    |e| to the last bit) — the guarantee the multi-session golden-row
    runs (amr/README.md rows 3-4) rely on."""
    from laghos_tpu.amr.driver import (load_checkpoint, resume_amr_hydro,
                                       run_amr)
    from laghos_tpu.amr.solver import AMRHydro

    def build():
        f = Forest(2, (2, 2), (1.0, 1.0), max_depth=3)
        for _ in range(3):
            corner = [k for k in f.leaf_list()
                      if all(v == 0 for v in k[1])]
            f.refine(corner, balance=False)
        opt = Options(problem=1, blast_energy=0.25, order_v=2, order_e=1,
                      cg_tol=1e-8)
        return AMRHydro(f, opt, h0=0.25)

    straight_trace = []
    res_a = run_amr(build(), t_final=0.8, ref_threshold=2e-4,
                    max_steps=24, vis_steps=1000, trace=straight_trace)

    cpath = str(tmp_path / "ck.pkl")
    part_trace = []
    run_amr(build(), t_final=0.8, ref_threshold=2e-4, max_steps=12,
            vis_steps=1000, trace=part_trace, ckpt_path=cpath,
            ckpt_every=5)
    ck = load_checkpoint(cpath)
    opt = Options(problem=1, blast_energy=0.25, order_v=2, order_e=1,
                  cg_tol=1e-8)
    h2 = resume_amr_hydro(ck, opt)
    trace2 = list(ck["trace"])
    res_b = run_amr(h2, t_final=0.8, ref_threshold=2e-4, max_steps=24,
                    vis_steps=1000, trace=trace2, resume=ck)

    assert res_b["steps"] == res_a["steps"]
    assert res_b["NE"] == res_a["NE"]
    assert res_b["e_norm"] == res_a["e_norm"]
    assert len(trace2) == len(straight_trace)
    for ra, rb in zip(straight_trace, trace2):
        assert ra == rb
