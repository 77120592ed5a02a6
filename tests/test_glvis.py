"""GLVis live-socket visualization gates (laghos_solver.cpp:43-94).

A local TCP listener stands in for the glvis server; the stream must be
genuine MFEM ASCII (solution\n + curved mesh + gridfunction) with the
grid functions in MFEM's entity-ordered global dof numbering.
"""

import socket
import threading

import numpy as np
import pytest

from laghos_tpu.fem import mesh as fmesh
from laghos_tpu.fem.space import build_h1_space
from laghos_tpu.hydro import Hydro, Options
from laghos_tpu.vis import (GLVisSession, GLVisWindow, gridfunction_str,
                            mesh_str, mfem_h1_dofs)


@pytest.fixture(scope="module")
def hydro2d():
    m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    m = fmesh.uniform_refine(m)
    return Hydro(m, Options(problem=1))


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 2), (2, 3), (3, 2)])
def test_mfem_h1_numbering_bijection(dim, p):
    path = ("/root/reference/data/square01_quad.mesh" if dim == 2
            else "/root/reference/data/cube01_hex.mesh")
    m = fmesh.uniform_refine(fmesh.load_mfem_mesh(path))
    sp = build_h1_space(m, p)
    perm = mfem_h1_dofs(sp)
    # bijection
    assert np.array_equal(np.sort(perm), np.arange(sp.ndof))
    # MFEM vertex dofs == mesh vertices, in vertex order
    assert np.allclose(sp.node_coords[perm[:m.num_verts]], m.verts)
    # edge-dof direction: for p >= 2 every mfem dof's coordinate is a
    # GLL point of some element; total count checks the entity split
    nedge = {2: 2 * (1 + 1), 3: 3}  # not used; count asserted inside


def test_mfem_numbering_edge_direction():
    # two elements sharing an edge: the shared edge dofs must be
    # assigned identically from both sides (p=3 -> 2 dofs per edge,
    # direction-sensitive)
    m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    sp = build_h1_space(m, 3)
    perm = mfem_h1_dofs(sp)  # would assert/collide on direction bugs
    assert np.array_equal(np.sort(perm), np.arange(sp.ndof))
    # geometric check: consecutive dofs of one edge lie on a line
    # between its two vertices, ordered min->max vertex id
    from laghos_tpu.vis import _enumerate_edges

    edges = _enumerate_edges(m)
    inv = {i: k for k, i in edges.items()}
    nv = m.num_verts
    for eidx in range(min(4, len(edges))):
        v0, v1 = sorted(inv[eidx])
        a, b = m.verts[v0], m.verts[v1]
        d0 = sp.node_coords[perm[nv + eidx * 2 + 0]]
        d1 = sp.node_coords[perm[nv + eidx * 2 + 1]]
        t0 = np.dot(d0 - a, b - a) / np.dot(b - a, b - a)
        t1 = np.dot(d1 - a, b - a) / np.dot(b - a, b - a)
        assert 0.0 < t0 < t1 < 1.0  # increasing toward the larger vertex


class _Capture(threading.Thread):
    """Accepts any number of connections, records each byte stream."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(8)
        self.port = self.srv.getsockname()[1]
        self.streams = []
        self.lock = threading.Lock()

    def run(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            t = threading.Thread(target=self._drain, args=(conn,),
                                 daemon=True)
            t.start()

    def _drain(self, conn):
        buf = b""
        conn.settimeout(5.0)
        try:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
        except OSError:
            pass
        with self.lock:
            self.streams.append(buf)

    def stop(self):
        self.srv.close()


def test_glvis_stream_roundtrip(hydro2d):
    h = hydro2d
    cap = _Capture()
    cap.start()
    sess = GLVisSession(h, "127.0.0.1", cap.port)
    sess.step(h.S0)
    sess.close()
    import time

    for _ in range(50):
        with cap.lock:
            if len(cap.streams) == 3 and all(cap.streams):
                break
        time.sleep(0.1)
    cap.stop()
    assert len(cap.streams) == 3
    texts = [s.decode() for s in cap.streams]
    for txt in texts:
        assert txt.startswith("solution\n")
        assert "MFEM mesh v1.0" in txt
        assert "nodes" in txt          # curved (deformed) mesh section
        assert "window_title" in txt   # first-open window commands
    # one of the streams is the H1 velocity: VDim == dim, value count
    vel = [t for t in texts if f"H1_2D_P{h.h1.p}\nVDim: 2\nOrdering: 0"
           in t]
    assert len(vel) == 1
    tail = vel[0].split("Ordering: 0\n\n", 1)[1]
    vals = [float(x) for x in tail.split("window_title")[0].split()]
    assert len(vals) == 2 * h.ndof
    # t=0 velocity is zero for Sedov
    assert np.allclose(vals, 0.0)
    # the L2 windows carry (NE * ld) Bernstein coefficients
    l2 = [t for t in texts if "L2_T2_2D_P" in t]
    assert len(l2) == 2


def test_glvis_connection_failure_is_graceful():
    # a port with no listener: window disables itself, no exception
    win = GLVisWindow("127.0.0.1", 1, title="x")
    assert win.send("solution\n") is False
    assert win.good is False
    assert win.send("again") is False   # stays silent/disabled


def test_mesh_str_plain_roundtrip(tmp_path):
    m = fmesh.load_mfem_mesh("/root/reference/data/square01_quad.mesh")
    txt = mesh_str(m)
    p = tmp_path / "m.mesh"
    p.write_text(txt)
    m2 = fmesh.load_mfem_mesh(str(p))
    assert np.allclose(m2.verts, m.verts)
    assert np.array_equal(m2.elems, m.elems)


def test_gridfunction_header():
    txt = gridfunction_str("L2_T2_2D_P1", 1, np.arange(4.0))
    assert txt.startswith("FiniteElementSpace\n"
                          "FiniteElementCollection: L2_T2_2D_P1\n"
                          "VDim: 1\nOrdering: 0\n\n")
    assert txt.strip().endswith("3.0")


def _rotated_two_hex_mesh():
    """Two unit hexes sharing the x=1 face, the second with its local
    frame rotated 90 deg about x — the shared quad face is traversed in
    DIFFERENT orientations by the two elements, exercising the
    face-orientation dof permutations (MFEM DofOrderForOrientation)."""
    xs, ys, zs = np.meshgrid(np.arange(3.0), np.arange(2.0),
                             np.arange(2.0), indexing="ij")
    verts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    # vid(x, y, z) = z + 2*y + 4*x with this meshgrid flattening
    def vid(x, y, z):
        return z + 2 * y + 4 * x
    hexA = [vid(0, 0, 0), vid(1, 0, 0), vid(1, 1, 0), vid(0, 1, 0),
            vid(0, 0, 1), vid(1, 0, 1), vid(1, 1, 1), vid(0, 1, 1)]
    # hex B: local corner (i,j,k) at physical (1+i, k, 1-j)
    def bvid(i, j, k):
        return vid(1 + i, k, 1 - j)
    hexB = [bvid(0, 0, 0), bvid(1, 0, 0), bvid(1, 1, 0), bvid(0, 1, 0),
            bvid(0, 0, 1), bvid(1, 0, 1), bvid(1, 1, 1), bvid(0, 1, 1)]
    elems = np.array([hexA, hexB], dtype=np.int32)
    return fmesh.Mesh(dim=3, verts=verts, elems=elems,
                      bdr_verts=np.zeros((0, 4), np.int32),
                      bdr_attr=np.zeros((0,), np.int32))


@pytest.mark.parametrize("p", [3, 4])
def test_mfem_numbering_face_orientation(p):
    """Nontrivially-oriented shared quad face: every shared face dof
    must resolve to the same local dof from both elements (asserted
    inside mfem_h1_dofs) and the map must stay a bijection."""
    m = _rotated_two_hex_mesh()
    sp = build_h1_space(m, p)
    perm = mfem_h1_dofs(sp)
    assert np.array_equal(np.sort(perm), np.arange(sp.ndof))
    # geometric sanity: face-interior dofs of the shared face lie on
    # the x=1 plane, and their mfem ordering walks the stored face's
    # frame (s fastest): consecutive dofs differ in exactly one
    # in-plane coordinate
    from laghos_tpu.vis import _enumerate_edges, _enumerate_faces

    nv = m.num_verts
    n_ed = len(_enumerate_edges(m))
    faces = _enumerate_faces(m)
    shared = [v for v in faces.values()
              if np.allclose(m.verts[list(v[1])][:, 0], 1.0)]
    assert len(shared) == 1
    fidx, stored = shared[0]
    off = nv + n_ed * (p - 1) + fidx * (p - 1) ** 2
    pts = sp.node_coords[perm[off:off + (p - 1) ** 2]]
    assert np.allclose(pts[:, 0], 1.0)
    # s runs fastest along stored v0 -> v1
    a = m.verts[stored[0]]
    b = m.verts[stored[1]]
    srow = pts[: p - 1]
    tvals = (srow - a) @ (b - a)
    assert np.all(np.diff(tvals) > 0)


def test_mfem_numbering_bijection_3d_p4():
    m = fmesh.load_mfem_mesh("/root/reference/data/cube01_hex.mesh")
    sp = build_h1_space(m, 4)
    perm = mfem_h1_dofs(sp)
    assert np.array_equal(np.sort(perm), np.arange(sp.ndof))


def test_glvis_stream_3d_q4():
    """A streamed 3D Q4-Q3 field against the fake server — the
    reference's VisualizeField streams any order
    (laghos_solver.cpp:43-94)."""
    import time

    m = fmesh.cartesian(3, (1, 1, 1), (1.0, 1.0, 1.0))
    h = Hydro(m, Options(problem=1, blast_energy=2.0, order_v=4,
                         order_e=3))
    cap = _Capture()
    cap.start()
    sess = GLVisSession(h, "127.0.0.1", cap.port)
    sess.step(h.S0)
    sess.close()
    for _ in range(50):
        with cap.lock:
            if len(cap.streams) == 3 and all(cap.streams):
                break
        time.sleep(0.1)
    cap.stop()
    texts = [s.decode() for s in cap.streams]
    assert len(texts) == 3
    vel = [t for t in texts if "H1_3D_P4\nVDim: 3\nOrdering: 0" in t]
    assert len(vel) == 1
    tail = vel[0].split("Ordering: 0\n\n", 1)[1]
    vals = [float(x) for x in tail.split("window_title")[0].split()]
    assert len(vals) == 3 * h.ndof
