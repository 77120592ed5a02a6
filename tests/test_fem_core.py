import numpy as np
import pytest

from laghos_tpu.fem import basis, mesh, quadrature, space


def test_gauss_legendre():
    for n in range(1, 11):
        x, w = quadrature.gauss_legendre(n)
        assert np.isclose(w.sum(), 1.0, atol=1e-15)
        # exact for polynomials up to degree 2n-1 on [0,1]
        for k in range(2 * n):
            assert np.isclose((w * x**k).sum(), 1.0 / (k + 1), atol=1e-13)


def test_gauss_lobatto():
    for n in range(2, 8):
        x = quadrature.gauss_lobatto(n)
        assert x[0] == 0.0 and x[-1] == 1.0
        assert np.all(np.diff(x) > 0)
    assert np.allclose(quadrature.gauss_lobatto(3), [0, 0.5, 1])


def test_lagrange_partition_of_unity():
    nodes = quadrature.gauss_lobatto(4)
    pts = np.linspace(0, 1, 7)
    B, G = basis.lagrange_tables(nodes, pts)
    assert np.allclose(B.sum(axis=1), 1.0, atol=1e-13)
    assert np.allclose(G.sum(axis=1), 0.0, atol=1e-12)
    # interpolation: reproduce cubic exactly
    f = nodes**3 - 2 * nodes
    assert np.allclose(B @ f, pts**3 - 2 * pts, atol=1e-13)
    assert np.allclose(G @ f, 3 * pts**2 - 2, atol=1e-12)


def test_lagrange_at_nodes():
    nodes = quadrature.gauss_lobatto(3)
    B, G = basis.lagrange_tables(nodes, nodes)
    assert np.allclose(B, np.eye(3), atol=1e-14)
    f = nodes**2
    assert np.allclose(G @ f, 2 * nodes, atol=1e-12)


def test_bernstein():
    B, G = basis.bernstein_tables(2, np.array([0.0, 0.3, 1.0]))
    assert np.allclose(B.sum(axis=1), 1.0)
    assert np.allclose(B[0], [1, 0, 0])
    assert np.allclose(B[2], [0, 0, 1])
    f = np.array([1.0, 2.0, 3.0])  # some poly in bernstein coeffs
    # d/dx of sum c_i B_i at 0.3
    h = 1e-6
    Bp, _ = basis.bernstein_tables(2, np.array([0.3 + h]))
    Bm, _ = basis.bernstein_tables(2, np.array([0.3 - h]))
    fd = ((Bp - Bm) / (2 * h)) @ f
    assert np.allclose(G[1] @ f, fd, atol=1e-6)


def test_nodal_to_bernstein():
    p = 3
    T = basis.nodal_to_bernstein(p)
    nodes, _ = quadrature.gauss_legendre(p + 1)
    f = 2 * nodes**3 - nodes + 0.5       # nodal values of a cubic
    b = T @ f                             # bernstein coeffs
    pts = np.linspace(0, 1, 11)
    B, _ = basis.bernstein_tables(p, pts)
    assert np.allclose(B @ b, 2 * pts**3 - pts + 0.5, atol=1e-12)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_cartesian_mesh(dim):
    m = mesh.cartesian(dim, (2, 3, 4), (1.0, 2.0, 3.0))
    assert m.num_elems == [2, 6, 24][dim - 1]
    vols = m.element_volumes()
    total = {1: 1.0, 2: 2.0, 3: 6.0}[dim]
    assert np.isclose(vols.sum(), total, atol=1e-12)
    if dim >= 2:
        assert set(np.unique(m.bdr_attr)) <= {1, 2, 3}


def test_refine_cartesian():
    m = mesh.cartesian(2, (2, 2), (1.0, 1.0))
    r = mesh.uniform_refine(m)
    assert r.num_elems == 16
    assert r.num_verts == 25
    assert np.isclose(r.element_volumes().sum(), 1.0, atol=1e-13)
    assert r.bdr_verts.shape[0] == 2 * m.bdr_verts.shape[0]


def test_refine_hex():
    m = mesh.cartesian(3, (1, 1, 1), (1.0, 1.0, 1.0))
    r = mesh.uniform_refine(m)
    assert r.num_elems == 8
    assert r.num_verts == 27
    assert np.isclose(r.element_volumes().sum(), 1.0, atol=1e-13)
    r2 = mesh.uniform_refine(r)
    assert r2.num_elems == 64
    assert r2.num_verts == 125


def test_load_square01():
    m = mesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    assert m.dim == 2 and m.num_elems == 4 and m.num_verts == 9
    assert np.isclose(m.element_volumes().sum(), 1.0)
    m3 = mesh.load_mfem_mesh("/root/reference/data/cube01_hex.mesh")
    assert m3.dim == 3 and m3.num_elems == 8
    assert np.isclose(m3.element_volumes().sum(), 1.0)


def test_load_netgen_unstr():
    m = mesh.load_netgen_2d(
        "/root/reference/data/square01_quad_unstr.mesh")
    assert m.dim == 2 and m.num_elems == 222 and m.num_verts == 247
    assert np.isclose(m.element_volumes().sum(), 1.0)
    assert m.element_volumes().min() > 0  # CCW orientation preserved
    # Laghos wall convention: attr 1 segments lie on x=0/1, attr 2 on y=0/1
    for attr, axis in ((1, 0), (2, 1)):
        mid = m.verts[m.bdr_verts[m.bdr_attr == attr]].mean(axis=1)
        assert np.all((np.abs(mid[:, axis]) < 1e-12)
                      | (np.abs(mid[:, axis] - 1.0) < 1e-12))


def test_load_rt2d():
    m = mesh.load_mfem_mesh("/root/reference/data/rt2D.mesh")
    assert m.dim == 2 and m.num_elems == 4
    assert np.isclose(m.element_volumes().sum(), 1.0)  # 0.5 x 2 domain


@pytest.mark.parametrize("dim,p", [(1, 2), (2, 1), (2, 2), (2, 3), (3, 2)])
def test_h1_dof_count_cartesian(dim, p):
    n = (3, 2, 2)
    m = mesh.cartesian(dim, n, (1.0, 1.0, 1.0))
    sp = space.build_h1_space(m, p)
    expect = 1
    for d in range(dim):
        expect *= n[d] * p + 1
    assert sp.ndof == expect
    # node coords should include the domain corners
    assert np.isclose(np.abs(sp.node_coords).max(), 1.0)


def test_h1_dof_count_refined_file():
    m = mesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    for _ in range(2):
        m = mesh.uniform_refine(m)
    sp = space.build_h1_space(m, 2)
    # 8x8 cartesian of order 2 -> 17^2
    assert sp.ndof == 17 * 17


def test_ess_masks():
    m = mesh.cartesian(2, (2, 2), (1.0, 1.0))
    sp = space.build_h1_space(m, 2)
    mx = sp.ess_mask(0)
    my = sp.ess_mask(1)
    x = sp.node_coords
    on_x = (np.abs(x[:, 0]) < 1e-12) | (np.abs(x[:, 0] - 1) < 1e-12)
    on_y = (np.abs(x[:, 1]) < 1e-12) | (np.abs(x[:, 1] - 1) < 1e-12)
    assert np.array_equal(mx, on_x)
    assert np.array_equal(my, on_y)


def test_mfem_mesh_roundtrip(tmp_path):
    m = mesh.cartesian(2, (3, 2), (1.0, 1.0))
    p = str(tmp_path / "rt.mesh")
    mesh.write_mfem_mesh(m, p)
    m2 = mesh.load_mfem_mesh(p)
    assert m2.num_elems == m.num_elems
    np.testing.assert_array_equal(m2.elems, m.elems)
    np.testing.assert_allclose(m2.verts, m.verts)
    np.testing.assert_array_equal(m2.bdr_attr, m.bdr_attr)


def test_sfc_partition_quality_and_equivalence():
    """Morton SFC element reordering (parallel/partition.py, the METIS
    replacement for unstructured meshes): contiguous chunks must cut far
    fewer shared vertices than a scrambled order, and the reordered mesh
    must produce the same physics (|e| after a few steps) to roundoff."""
    import dataclasses
    from collections import defaultdict

    import numpy as np

    from laghos_tpu import driver
    from laghos_tpu.fem import mesh as fmesh
    from laghos_tpu.hydro import Hydro, Options
    from laghos_tpu.parallel.partition import sfc_partition

    m = fmesh.cartesian(2, (2, 2), (1.0, 1.0))
    for _ in range(3):
        m = fmesh.uniform_refine(m)
    rng = np.random.default_rng(7)
    bad = dataclasses.replace(m, elems=m.elems[rng.permutation(m.num_elems)])
    sfc = sfc_partition(bad)

    def cut(mm, P=8):
        parts = np.arange(mm.num_elems) * P // mm.num_elems
        v2p = defaultdict(set)
        for e, vs in enumerate(mm.elems):
            for v in vs:
                v2p[v].add(parts[e])
        return sum(1 for ps in v2p.values() if len(ps) > 1)

    assert cut(sfc) < cut(bad) / 3

    opt = dict(problem=1, blast_energy=0.25, cg_tol=1e-12)
    r1 = driver.run(Hydro(m, Options(**opt)), t_final=1.0, max_steps=5,
                    verbose=False)
    r2 = driver.run(Hydro(sfc, Options(**opt)), t_final=1.0, max_steps=5,
                    verbose=False)
    assert r1.steps == r2.steps
    assert abs(r1.e_norm - r2.e_norm) / r1.e_norm < 1e-11
