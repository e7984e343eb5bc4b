"""Point-cloud / mesh transforms — reference ``torch_geometric/transforms/``
(center, normalize_scale, normalize_rotation, random_{flip,scale,rotate,
shear,translate}, linear_transformation, fixed_points, delaunay,
face_to_edge, generate_mesh_normals, sample_points, point_pair_features,
polar, spherical, local_cartesian, grid_sampling).

Host-side NumPy, like the rest of this package's transforms (they run in the
input pipeline before padding).  Positions live in ``Graph.nodes`` unless a
``pos`` override is passed; mesh-stage transforms operate on a small
:class:`MeshData` carrier (pos, face, x, y) because the framework's
:class:`~..data.graph.Graph` deliberately has no ``face`` field —
``FaceToEdge`` is the bridge back to ``Graph``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Union

import numpy as np

from ..data.graph import Graph

Scalar = Union[int, float]


class MeshData(NamedTuple):
    """Mesh/point-cloud carrier for the pre-graph stage."""

    pos: np.ndarray                      # [N, D]
    face: Optional[np.ndarray] = None    # [3, F] triangle vertex ids
    x: Optional[np.ndarray] = None       # [N, F_x]
    y: Optional[np.ndarray] = None
    norm: Optional[np.ndarray] = None    # [N, D] vertex normals


def _get_pos(data):
    if isinstance(data, MeshData):
        return np.asarray(data.pos, np.float64)
    return np.asarray(data.nodes, np.float64)


def _set_pos(data, pos):
    pos = pos.astype(np.float32)
    if isinstance(data, MeshData):
        return data._replace(pos=pos)
    return data.replace(nodes=pos)


class Center:
    """reference ``center.py`` — subtract the centroid."""

    def __call__(self, data):
        pos = _get_pos(data)
        return _set_pos(data, pos - pos.mean(axis=0, keepdims=True))


class NormalizeScale:
    """reference ``normalize_scale.py`` — center, then scale into (−1, 1)."""

    def __call__(self, data):
        data = Center()(data)
        pos = _get_pos(data)
        scale = 1.0 / max(np.abs(pos).max(), 1e-12) * 0.999999
        return _set_pos(data, pos * scale)


class NormalizeRotation:
    """reference ``normalize_rotation.py`` — rotate onto the PCA frame
    (eigenvectors of the position covariance); normals co-rotate."""

    def __init__(self, max_points: int = -1):
        self.max_points = max_points

    def __call__(self, data):
        pos = _get_pos(data)
        sample = pos
        if 0 < self.max_points < len(pos):
            idx = np.random.default_rng(0).choice(
                len(pos), self.max_points, replace=False
            )
            sample = pos[idx]
        c = sample - sample.mean(0, keepdims=True)
        _, _, vt = np.linalg.svd(c, full_matrices=False)
        out = _set_pos(data, pos @ vt.T)
        if isinstance(data, MeshData) and data.norm is not None:
            out = out._replace(norm=(data.norm @ vt.T).astype(np.float32))
        return out


class LinearTransformation:
    """reference ``linear_transformation.py`` — pos @ matrixᵀ (the reference
    right-multiplies ``pos @ matrix``; kept exactly)."""

    def __init__(self, matrix: np.ndarray):
        self.matrix = np.asarray(matrix, np.float64)

    def __call__(self, data):
        return _set_pos(data, _get_pos(data) @ self.matrix)


class RandomFlip:
    """reference ``random_flip.py``"""

    def __init__(self, axis: int, p: float = 0.5, seed: Optional[int] = None):
        self.axis = axis
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        pos = _get_pos(data)
        if self.rng.random() < self.p:
            pos = pos.copy()
            pos[:, self.axis] = -pos[:, self.axis]
        return _set_pos(data, pos)


class RandomScale:
    """reference ``random_scale.py`` — global uniform scale from [a, b]."""

    def __init__(self, scales, seed: Optional[int] = None):
        self.scales = scales
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        s = self.rng.uniform(*self.scales)
        return _set_pos(data, _get_pos(data) * s)


class RandomRotate:
    """reference ``random_rotate.py`` — rotation by U(−d, d) degrees about
    ``axis`` (2D rotates in-plane)."""

    def __init__(self, degrees, axis: int = 0, seed: Optional[int] = None):
        self.degrees = (
            (-abs(degrees), abs(degrees))
            if isinstance(degrees, (int, float))
            else tuple(degrees)
        )
        self.axis = axis
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        pos = _get_pos(data)
        deg = self.rng.uniform(*self.degrees)
        a = np.deg2rad(deg)
        c, s = np.cos(a), np.sin(a)
        if pos.shape[1] == 2:
            m = np.array([[c, -s], [s, c]])
        elif self.axis == 0:
            m = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        elif self.axis == 1:
            m = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        else:
            m = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        return LinearTransformation(m.T)(data)


class RandomShear:
    """reference ``random_shear.py`` — off-diagonal shear U(−s, s)."""

    def __init__(self, shear: Scalar, seed: Optional[int] = None):
        self.shear = abs(shear)
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        pos = _get_pos(data)
        d = pos.shape[1]
        m = self.rng.uniform(-self.shear, self.shear, (d, d))
        np.fill_diagonal(m, 1.0)
        return LinearTransformation(m)(data)


class RandomTranslate:
    """reference ``random_translate.py`` — per-node jitter U(−t, t)."""

    def __init__(self, translate, seed: Optional[int] = None):
        self.translate = translate
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        pos = _get_pos(data)
        n, d = pos.shape
        ts = self.translate
        if isinstance(ts, (int, float)):
            ts = [ts] * d
        jitter = np.stack(
            [self.rng.uniform(-abs(t), abs(t), n) for t in ts], axis=1
        )
        return _set_pos(data, pos + jitter)


class FixedPoints:
    """reference ``fixed_points.py`` — subsample exactly ``num`` points
    (with replacement by default, like the reference)."""

    def __init__(self, num: int, replace: bool = True,
                 allow_duplicates: bool = False, seed: Optional[int] = None):
        self.num = num
        self.replace = replace
        self.allow_duplicates = allow_duplicates
        self.rng = np.random.default_rng(seed)

    def __call__(self, data: MeshData) -> MeshData:
        n = len(data.pos)
        if self.replace:
            idx = self.rng.integers(0, n, self.num)
        elif not self.allow_duplicates:
            idx = self.rng.permutation(n)[: self.num]
        else:
            reps = int(np.ceil(self.num / n))
            idx = np.concatenate(
                [self.rng.permutation(n) for _ in range(reps)]
            )[: self.num]
        take = lambda a: None if a is None else np.asarray(a)[idx]
        y = data.y
        if y is not None and len(np.asarray(y)) == n:
            y = take(y)
        return MeshData(
            pos=take(data.pos), face=None, x=take(data.x), y=y,
            norm=take(data.norm),
        )


class Delaunay:
    """reference ``delaunay.py`` — Delaunay triangulation of pos → face."""

    def __call__(self, data: MeshData) -> MeshData:
        import scipy.spatial

        pos = np.asarray(data.pos)
        if pos.shape[0] < 3:
            face = np.zeros((3, 0), np.int64)
        elif pos.shape[0] == 3:
            face = np.array([[0], [1], [2]], np.int64)
        else:
            tri = scipy.spatial.Delaunay(pos[:, :2], qhull_options="QJ")
            face = tri.simplices.T.astype(np.int64)
        return data._replace(face=face)


class FaceToEdge:
    """reference ``face_to_edge.py`` — triangle faces → undirected Graph."""

    def __init__(self, remove_faces: bool = True):
        self.remove_faces = remove_faces

    def __call__(self, data: MeshData) -> Graph:
        f = np.asarray(data.face)
        ei = np.concatenate([f[:2], f[1:], f[::2]], axis=1)
        # undirected + coalesced
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        key = ei[0].astype(np.int64) * (ei.max() + 1) + ei[1]
        _, first = np.unique(key, return_index=True)
        ei = ei[:, np.sort(first)]
        n = len(data.pos)
        x = data.pos if data.x is None else np.concatenate(
            [np.asarray(data.x, np.float32),
             np.asarray(data.pos, np.float32)], axis=1
        )
        return Graph(
            nodes=np.asarray(x, np.float32),
            senders=ei[0].astype(np.int32),
            receivers=ei[1].astype(np.int32),
            n_node=np.asarray([n], np.int32),
            n_edge=np.asarray([ei.shape[1]], np.int32),
            y=data.y,
        )


class GenerateMeshNormals:
    """reference ``generate_mesh_normals.py`` — area-weighted vertex normals
    from face normals."""

    def __call__(self, data: MeshData) -> MeshData:
        pos = np.asarray(data.pos, np.float64)
        f = np.asarray(data.face)
        vec1 = pos[f[1]] - pos[f[0]]
        vec2 = pos[f[2]] - pos[f[0]]
        fn = np.cross(vec1, vec2)  # unnormalized = area-weighted
        vn = np.zeros_like(pos)
        for k in range(3):
            np.add.at(vn, f[k], fn)
        norm = np.linalg.norm(vn, axis=1, keepdims=True)
        vn = vn / np.maximum(norm, 1e-12)
        return data._replace(norm=vn.astype(np.float32))


class SamplePoints:
    """reference ``sample_points.py`` — uniform surface sampling of a mesh,
    probability ∝ face area; optional normals."""

    def __init__(self, num: int, remove_faces: bool = True,
                 include_normals: bool = False, seed: Optional[int] = None):
        self.num = num
        self.remove_faces = remove_faces
        self.include_normals = include_normals
        self.rng = np.random.default_rng(seed)

    def __call__(self, data: MeshData) -> MeshData:
        pos = np.asarray(data.pos, np.float64)
        f = np.asarray(data.face)
        v1, v2, v3 = pos[f[0]], pos[f[1]], pos[f[2]]
        area = 0.5 * np.linalg.norm(np.cross(v2 - v1, v3 - v1), axis=1)
        prob = area / max(area.sum(), 1e-12)
        choice = self.rng.choice(len(prob), self.num, p=prob)
        u = self.rng.random((self.num, 1))
        v = self.rng.random((self.num, 1))
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u)
        v = np.where(flip, 1 - v, v)
        a, b, c = v1[choice], v2[choice], v3[choice]
        sampled = a + u * (b - a) + v * (c - a)
        norm = None
        if self.include_normals:
            fn = np.cross(b - a, c - a)
            norm = (
                fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
            ).astype(np.float32)
        return MeshData(
            pos=sampled.astype(np.float32),
            face=None if self.remove_faces else f,
            norm=norm,
        )


def _edge_vectors(g: Graph, pos):
    pos = _get_pos(g) if pos is None else np.asarray(pos, np.float64)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    return pos, pos[s] - pos[r], s, r


def _maybe_cat(g: Graph, new: np.ndarray, cat: bool) -> Graph:
    if cat and g.edges is not None:
        e = np.asarray(g.edges)
        e = e[:, None] if e.ndim == 1 else e
        new = np.concatenate([e, new], axis=-1)
    return g.replace(edges=new.astype(np.float32))


class Polar:
    """reference ``polar.py`` — 2D edge attr (ρ, θ), normalized to [0, 1]."""

    def __init__(self, norm: bool = True, max_value: Optional[float] = None,
                 cat: bool = True):
        self.norm, self.max, self.cat = norm, max_value, cat

    def __call__(self, g: Graph, pos: Optional[np.ndarray] = None) -> Graph:
        _, rel, _, _ = _edge_vectors(g, pos)
        rho = np.linalg.norm(rel, axis=1)
        theta = np.arctan2(rel[:, 1], rel[:, 0])
        if self.norm:
            rho = rho / max(rho.max() if self.max is None else self.max, 1e-12)
            theta = theta / (2 * np.pi) + 0.5  # atan2 ∈ (−π, π] → [0, 1)
        out = np.stack([rho, theta], axis=1)
        return _maybe_cat(g, out, self.cat)


class Spherical:
    """reference ``spherical.py`` — 3D edge attr (ρ, θ, φ)."""

    def __init__(self, norm: bool = True, max_value: Optional[float] = None,
                 cat: bool = True):
        self.norm, self.max, self.cat = norm, max_value, cat

    def __call__(self, g: Graph, pos: Optional[np.ndarray] = None) -> Graph:
        _, rel, _, _ = _edge_vectors(g, pos)
        rho = np.linalg.norm(rel, axis=1)
        theta = np.arctan2(rel[:, 1], rel[:, 0])
        phi = np.arccos(np.clip(rel[:, 2] / np.maximum(rho, 1e-12), -1, 1))
        if self.norm:
            rho = rho / max(rho.max() if self.max is None else self.max, 1e-12)
            theta = theta / (2 * np.pi) + 0.5
            phi = phi / np.pi
        out = np.stack([rho, theta, phi], axis=1)
        return _maybe_cat(g, out, self.cat)


class LocalCartesian:
    """reference ``local_cartesian.py`` — relative position normalized by the
    receiver's max coordinate range."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm, self.cat = norm, cat

    def __call__(self, g: Graph, pos: Optional[np.ndarray] = None) -> Graph:
        p, rel, s, r = _edge_vectors(g, pos)
        n = len(p)
        mx = np.zeros(n)
        np.maximum.at(mx, r, np.abs(rel).max(axis=1))
        rel = rel / np.maximum(2 * mx[r][:, None], 1e-12) + 0.5
        return _maybe_cat(g, rel, self.cat)


class PointPairFeatures:
    """reference ``point_pair_features.py`` — rotation-invariant edge attr
    (‖d‖, ∠(n_s, d), ∠(n_r, d), ∠(n_s, n_r)) from positions + normals."""

    def __init__(self, cat: bool = True):
        self.cat = cat

    def __call__(self, g: Graph, pos: np.ndarray, norm: np.ndarray) -> Graph:
        pos = np.asarray(pos, np.float64)
        nrm = np.asarray(norm, np.float64)
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        d = pos[r] - pos[s]

        def angle(a, b):
            cross = np.linalg.norm(np.cross(a, b), axis=1)
            dot = np.sum(a * b, axis=1)
            return np.arctan2(cross, dot)

        out = np.stack(
            [
                np.linalg.norm(d, axis=1),
                angle(nrm[s], d),
                angle(nrm[r], d),
                angle(nrm[s], nrm[r]),
            ],
            axis=1,
        )
        return _maybe_cat(g, out, self.cat)


class GridSampling:
    """reference ``grid_sampling.py`` — voxel-cluster points; mean-pool pos/x,
    majority-vote y."""

    def __init__(self, size, start=None, end=None):
        self.size, self.start, self.end = size, start, end

    def __call__(self, data: MeshData) -> MeshData:
        import jax.numpy as jnp

        from ..nn.pool.voxel_grid import voxel_grid

        pos = np.asarray(data.pos, np.float64)
        cluster = np.asarray(
            voxel_grid(
                jnp.asarray(pos, jnp.float32),
                jnp.zeros(len(pos), jnp.int32),
                self.size, start=self.start, end=self.end,
                num_graphs=1, consecutive=True,
            )
        )
        k = cluster.max() + 1

        def mean_pool(a):
            if a is None:
                return None
            a = np.asarray(a, np.float64)
            out = np.zeros((k,) + a.shape[1:])
            np.add.at(out, cluster, a)
            cnt = np.bincount(cluster, minlength=k).astype(np.float64)
            return (out / np.maximum(cnt, 1)[:, None]).astype(np.float32)

        y = data.y
        if y is not None and len(np.asarray(y)) == len(pos):
            y = np.asarray(y)
            nc = int(y.max()) + 1
            votes = np.zeros((k, nc), np.int64)
            np.add.at(votes, (cluster, y), 1)
            y = votes.argmax(axis=1)
        return MeshData(
            pos=mean_pool(pos), face=None, x=mean_pool(data.x), y=y,
            norm=mean_pool(data.norm),
        )


class ToSLIC:
    """reference ``to_superpixels.py:ToSLIC`` — image → superpixel cloud:
    mean color per superpixel in ``x``, centroid in ``pos`` (a
    :class:`MeshData`, ready for :class:`KNNGraph`/:class:`RadiusGraph`).

    Uses :func:`skimage.segmentation.slic` when scikit-image is installed;
    otherwise falls back to a built-in minimal SLIC (localized k-means over
    (color·m, x, y) with 2S×2S search windows — the reference hard-requires
    scikit-image, ``to_superpixels.py:40-41``)."""

    def __init__(self, n_segments: int = 75, compactness: float = 10.0,
                 n_iter: int = 10, add_seg: bool = False, **kwargs):
        self.n_segments = int(n_segments)
        self.compactness = float(compactness)
        self.n_iter = int(n_iter)
        self.add_seg = add_seg
        self.kwargs = kwargs

    def _slic_numpy(self, img):
        h, w, c = img.shape
        s = max(int(np.sqrt(h * w / self.n_segments)), 1)
        cy = np.arange(s // 2, h, s)
        cx = np.arange(s // 2, w, s)
        centers = np.asarray([(y, x) for y in cy for x in cx], np.float64)
        k = len(centers)
        feat = np.concatenate(
            [img.reshape(-1, c),
             np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                      -1).reshape(-1, 2)], axis=1)
        # color scaled against the spatial term: m/S like SLIC's distance
        m = self.compactness
        cfeat = np.zeros((k, c + 2))
        cfeat[:, c:] = centers
        for j in range(k):
            y, x = centers[j].astype(int)
            cfeat[j, :c] = img[min(y, h - 1), min(x, w - 1)]
        label = np.zeros(h * w, np.int64)
        for _ in range(self.n_iter):
            dist = np.full(h * w, np.inf)
            for j in range(k):
                y0 = int(max(cfeat[j, c] - s, 0)); y1 = int(min(cfeat[j, c] + s + 1, h))
                x0 = int(max(cfeat[j, c + 1] - s, 0)); x1 = int(min(cfeat[j, c + 1] + s + 1, w))
                yy, xx = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                                     indexing="ij")
                idx = (yy * w + xx).reshape(-1)
                f = feat[idx]
                dc = ((f[:, :c] - cfeat[j, :c]) ** 2).sum(1)
                ds = ((f[:, c:] - cfeat[j, c:]) ** 2).sum(1)
                dd = dc / (m * m) + ds / (s * s)
                upd = dd < dist[idx]
                dist[idx[upd]] = dd[upd]
                label[idx[upd]] = j
            for j in range(k):
                mask = label == j
                if mask.any():
                    cfeat[j] = feat[mask].mean(0)
        # compact labels (empty windows can lose all pixels)
        uniq, label = np.unique(label, return_inverse=True)
        return label.reshape(h, w)

    def __call__(self, img):
        img = np.asarray(img, np.float64)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[0] in (1, 3) and img.shape[0] < img.shape[2]:
            img = np.transpose(img, (1, 2, 0))  # CHW -> HWC like the reference
        h, w, c = img.shape
        try:  # pragma: no cover - optional dependency
            from skimage.segmentation import slic

            seg = slic(img, start_label=0, n_segments=self.n_segments,
                       compactness=self.compactness, **self.kwargs)
        except ImportError:
            seg = self._slic_numpy(img)
        seg = np.asarray(seg).reshape(h * w)
        k = int(seg.max()) + 1
        x = np.zeros((k, c)); cnt = np.zeros(k)
        np.add.at(x, seg, img.reshape(-1, c)); np.add.at(cnt, seg, 1)
        x /= np.maximum(cnt, 1)[:, None]
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        pos = np.zeros((k, 2))
        np.add.at(pos, seg, np.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        pos /= np.maximum(cnt, 1)[:, None]
        out = MeshData(pos=pos.astype(np.float32), x=x.astype(np.float32))
        if self.add_seg:
            return out, seg.reshape(h, w)
        return out
