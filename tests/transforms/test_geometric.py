"""Point-cloud / mesh / structural transform tests (reference
``test/transforms/`` patterns)."""
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import transforms as T
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import from_edge_index


def square_mesh():
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    face = np.array([[0, 0], [1, 2], [2, 3]], np.int64)
    return T.MeshData(pos=pos, face=face)


def test_center_and_normalize_scale(rng):
    d = T.MeshData(pos=rng.uniform(2, 5, (20, 3)).astype(np.float32))
    c = T.Center()(d)
    np.testing.assert_allclose(np.asarray(c.pos).mean(0), 0, atol=1e-5)
    s = T.NormalizeScale()(d)
    assert np.abs(s.pos).max() <= 1.0
    np.testing.assert_allclose(np.asarray(s.pos).mean(0), 0, atol=1e-5)


def test_random_rotate_preserves_distances(rng):
    d = T.MeshData(pos=rng.normal(size=(10, 3)).astype(np.float32))
    r = T.RandomRotate(180, axis=1, seed=3)(d)
    d0 = np.linalg.norm(d.pos[:, None] - d.pos[None], axis=-1)
    d1 = np.linalg.norm(r.pos[:, None] - r.pos[None], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-5)


def test_random_flip_translate_scale_shear(rng):
    d = T.MeshData(pos=rng.normal(size=(10, 2)).astype(np.float32))
    f = T.RandomFlip(axis=0, p=1.0, seed=0)(d)
    np.testing.assert_allclose(f.pos[:, 0], -d.pos[:, 0], rtol=1e-6)
    np.testing.assert_allclose(f.pos[:, 1], d.pos[:, 1], rtol=1e-6)
    t = T.RandomTranslate(0.1, seed=0)(d)
    assert np.abs(np.asarray(t.pos) - d.pos).max() <= 0.1 + 1e-6
    s = T.RandomScale((2.0, 2.0), seed=0)(d)
    np.testing.assert_allclose(s.pos, d.pos * 2, rtol=1e-6)
    sh = T.RandomShear(0.0, seed=0)(d)
    np.testing.assert_allclose(sh.pos, d.pos, atol=1e-6)


def test_fixed_points():
    d = T.MeshData(pos=np.arange(30, dtype=np.float32).reshape(10, 3),
                   y=np.arange(10))
    out = T.FixedPoints(4, replace=False, seed=0)(d)
    assert out.pos.shape == (4, 3) and out.y.shape == (4,)
    # y rows track pos rows
    np.testing.assert_array_equal(out.pos[:, 0] // 3, out.y)


def test_delaunay_face_to_edge_chain(rng):
    d = T.MeshData(pos=rng.uniform(0, 1, (12, 2)).astype(np.float32))
    mesh = T.Delaunay()(d)
    assert mesh.face.shape[0] == 3 and mesh.face.shape[1] > 0
    g = T.FaceToEdge()(mesh)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    fwd = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in fwd for a, b in fwd)  # undirected
    assert len(fwd) == len(s)  # coalesced


def test_mesh_normals_flat_square():
    mesh = square_mesh()
    out = T.GenerateMeshNormals()(mesh)
    # flat square in z=0 plane: all normals ±z
    np.testing.assert_allclose(np.abs(out.norm[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(out.norm[:, :2], 0.0, atol=1e-6)


def test_sample_points_on_unit_square():
    mesh = square_mesh()
    out = T.SamplePoints(256, include_normals=True, seed=0)(mesh)
    assert out.pos.shape == (256, 3)
    assert (out.pos[:, :2] >= -1e-6).all() and (out.pos[:, :2] <= 1 + 1e-6).all()
    np.testing.assert_allclose(out.pos[:, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(out.norm[:, 2]), 1.0, atol=1e-5)


def test_grid_sampling_pools_means():
    pos = np.array([[0.1, 0.1], [0.2, 0.2], [0.9, 0.9]], np.float32)
    d = T.MeshData(pos=pos, x=np.array([[1.0], [3.0], [10.0]], np.float32),
                   y=np.array([0, 0, 1]))
    out = T.GridSampling(0.5)(d)
    assert len(out.pos) == 2
    np.testing.assert_allclose(sorted(out.x[:, 0].tolist()), [2.0, 10.0])
    assert set(out.y.tolist()) == {0, 1}


def test_polar_spherical_local_cartesian(rng):
    pos = rng.normal(size=(6, 3)).astype(np.float32)
    ei = np.array([[0, 1, 2, 3, 4], [1, 2, 3, 4, 5]])
    g = from_edge_index(pos, ei)
    sp = T.Spherical(cat=False)(g)
    e = np.asarray(sp.edges)
    assert e.shape == (5, 3)
    assert (e >= -1e-6).all() and (e <= 1 + 1e-6).all()
    g2 = from_edge_index(pos[:, :2], ei)
    po = T.Polar(cat=False)(g2)
    assert np.asarray(po.edges).shape == (5, 2)
    lc = T.LocalCartesian(cat=False)(g)
    e = np.asarray(lc.edges)
    assert (e >= -1e-6).all() and (e <= 1 + 1e-6).all()


def test_point_pair_features_rotation_invariant(rng):
    pos = rng.normal(size=(5, 3)).astype(np.float64)
    norm = rng.normal(size=(5, 3))
    norm /= np.linalg.norm(norm, axis=1, keepdims=True)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    g = from_edge_index(pos.astype(np.float32), ei)
    f1 = np.asarray(T.PointPairFeatures(cat=False)(g, pos, norm).edges)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    f2 = np.asarray(
        T.PointPairFeatures(cat=False)(g, pos @ q.T, norm @ q.T).edges
    )
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5)


# --- structural ------------------------------------------------------------

def test_constant_and_remove_isolated(rng):
    x = rng.normal(size=(5, 2)).astype(np.float32)
    g = from_edge_index(x, np.array([[0, 1], [1, 2]]))
    c = T.Constant(9.0)(g)
    np.testing.assert_allclose(np.asarray(c.nodes)[:, -1], 9.0)
    out = T.RemoveIsolatedNodes()(g)
    assert int(out.n_node[0]) == 3
    np.testing.assert_array_equal(np.asarray(out.senders), [0, 1])
    np.testing.assert_array_equal(np.asarray(out.receivers), [1, 2])


def test_sign_matches_dense_power(rng):
    n = 8
    ei = np.array([[0, 1, 2, 3, 4, 5, 6, 7], [1, 2, 3, 4, 5, 6, 7, 0]])
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    g = from_edge_index(x, ei)
    out = np.asarray(T.SIGN(2)(g).nodes)
    a = np.zeros((n, n))
    a[ei[1], ei[0]] = 1
    deg = a.sum(1)
    dinv = np.diag(deg**-0.5)
    an = dinv @ a @ dinv
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-5)
    np.testing.assert_allclose(out[:, 3:6], an @ x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[:, 6:9], an @ an @ x, rtol=1e-4, atol=1e-5)


def test_line_graph_undirected_triangle():
    # triangle: 3 undirected edges, line graph = triangle again
    ei = np.array([[0, 1, 0, 2, 1, 2], [1, 0, 2, 0, 2, 1]])
    g = from_edge_index(None, ei, num_nodes=3)
    lg = T.LineGraph()(g)
    assert int(lg.n_node[0]) == 3
    assert int(lg.n_edge[0]) == 6  # each pair of edges shares a vertex


def test_laplacian_lambda_max_path_graph():
    # path 0-1-2: sym-normalized Laplacian lambda_max = 2 for bipartite
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    g = from_edge_index(None, ei, num_nodes=3)
    out = T.LaplacianLambdaMax(normalization="sym", is_undirected=True)(g)
    lam = float(np.asarray(out.globals).ravel()[-1])
    assert lam == pytest.approx(2.0, abs=1e-4)


def test_to_dense_and_to_sparse_tensor(rng):
    x = rng.normal(size=(3, 2)).astype(np.float32)
    g = from_edge_index(x, np.array([[2, 0, 1], [0, 1, 0]]))
    d = T.ToDense(num_nodes=5)(g)
    assert d.adj.shape == (5, 5) and d.mask.sum() == 3
    assert d.adj[0, 2] == 1 and d.adj[1, 0] == 1 and d.adj[0, 1] == 1
    st = T.ToSparseTensor()(g)
    r = np.asarray(st.receivers)
    assert (np.diff(r) >= 0).all()
