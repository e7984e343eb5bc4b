"""k-nearest-neighbor graph construction — on-device, static shapes.

The reference delegates kNN to the ``torch-cluster`` C++/CUDA extension
(``torch_geometric/nn/conv/gravnet_conv.py:14``, ``x_conv.py:13``,
``transforms/knn_graph.py``).  The TPU-native design computes the dense
pairwise-distance matrix and takes a top-k — an O(N^2) matmul that the MXU
eats for the graph sizes point-cloud layers see, with batch separation
enforced by masking (no dynamic shapes, no host round trip).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[Na, Nb] squared euclidean distances (|a|^2 - 2ab + |b|^2 via MXU)."""
    a2 = jnp.sum(a * a, axis=-1)[:, None]
    b2 = jnp.sum(b * b, axis=-1)[None, :]
    cross = a @ b.T
    return jnp.maximum(a2 - 2.0 * cross + b2, 0.0)


# rows at least this wide take the two-stage chunked smallest-k path:
# lax.top_k lowers to a full-width sorting network whose Mosaic compile
# time explodes with row width (measured ~40 min at width 8192 in
# benchmark/points.py edge_cnn), while per-512-chunk top_k + merge
# compiles in seconds and runs at HBM speed.
_TWO_STAGE_WIDTH = 4096


_CHUNK = 512


def _smallest_k(d: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-smallest per row of ``d`` → (values [N,k], indices [N,k]).

    Tie-breaking matches ``lax.top_k`` (lowest index first).  Wide rows use
    a two-stage exact selection: per-512-chunk ``top_k`` (narrow sort
    networks that compile fast) followed by a top-k merge over the
    ``nchunks*k`` candidates — any global k-smallest element is among its
    chunk's k smallest, and candidate order (chunk asc, rank asc) preserves
    the lowest-index-first tie-break.  When the merge is itself wide it
    recurses (candidate width shrinks by ≥2× per level for k ≤ 256), so
    the full-width sorting network is never built for any k ≤ 256.
    """
    n, w = d.shape
    # k > _CHUNK//2 cannot guarantee a shrinking recursion (nc*k could
    # match w); such k on wide rows does not occur in the point-cloud
    # layers this serves
    if w < _TWO_STAGE_WIDTH or k > _CHUNK // 2:
        neg_v, idx = jax.lax.top_k(-d, k)
        return -neg_v, idx
    pad = (-w) % _CHUNK
    if pad:
        d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    nc = d.shape[1] // _CHUNK
    dc = d.reshape(n, nc, _CHUNK)
    cv, ci = jax.lax.top_k(-dc, k)                       # [n, nc, k]
    offs = (jnp.arange(nc, dtype=jnp.int32) * _CHUNK)[None, :, None]
    cand_v = cv.reshape(n, nc * k)
    cand_i = (ci.astype(jnp.int32) + offs).reshape(n, nc * k)
    mv, j = _smallest_k(-cand_v, k)                      # [n, k] (recursive)
    v2 = -mv
    idx = jnp.take_along_axis(cand_i, j, 1)
    # padding positions can only surface from all-inf tails; keep indices
    # in range (their distance stays +inf, which callers already treat as
    # invalid)
    idx = jnp.minimum(idx, w - 1)
    return -v2, idx


def knn(
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    k: int,
    batch_src: Optional[jnp.ndarray] = None,
    batch_dst: Optional[jnp.ndarray] = None,
    *,
    mask_src: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each row of ``x_dst``, the ``k`` nearest rows of ``x_src``.

    Returns ``(indices [Ndst, k], sqdists [Ndst, k])``.  Cross-graph pairs
    (``batch`` mismatch) and invalid sources (``mask_src`` False) are pushed
    to +inf distance, so with enough same-graph neighbors they never appear.
    Role equivalent of torch-cluster's ``knn`` (``gravnet_conv.py:89``).
    """
    d = pairwise_sqdist(x_dst, x_src)
    if batch_src is not None and batch_dst is not None:
        same = batch_dst[:, None] == batch_src[None, :]
        d = jnp.where(same, d, jnp.inf)
    if mask_src is not None:
        d = jnp.where(mask_src[None, :], d, jnp.inf)
    sd, idx = _smallest_k(d, k)
    return idx, sd


def knn_graph(
    pos: jnp.ndarray,
    k: int,
    batch: Optional[jnp.ndarray] = None,
    *,
    loop: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COO ``(senders, receivers)`` of each node's k nearest neighbors.

    ``senders[e]`` is the neighbor, ``receivers[e]`` the center node —
    matching the reference's ``knn_graph(..., flow='target_to_source')``
    convention used by ``XConv`` (``x_conv.py:126``).  With ``loop=False``
    the self-match is excluded by inflating the diagonal.
    """
    n = pos.shape[0]
    d = pairwise_sqdist(pos, pos)
    if batch is not None:
        same = batch[:, None] == batch[None, :]
        d = jnp.where(same, d, jnp.inf)
    if mask is not None:
        d = jnp.where(mask[None, :], d, jnp.inf)
    if not loop:
        d = d + jnp.diag(jnp.full((n,), jnp.inf, d.dtype))
    _, idx = _smallest_k(d, k)             # [N, k] neighbor ids
    receivers = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    senders = idx.reshape(-1).astype(jnp.int32)
    return senders, receivers


def nearest(x, y, batch_x=None, batch_y=None):
    """reference ``nn/pool/__init__`` ``nearest`` (torch-cluster role):
    index of the nearest ``y`` row for every ``x`` row."""
    d = pairwise_sqdist(x, y)
    if batch_x is not None and batch_y is not None:
        same = batch_x[:, None] == batch_y[None, :]
        d = jnp.where(same, d, jnp.inf)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def radius(
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    r: float,
    batch_src=None,
    batch_dst=None,
    max_num_neighbors: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """reference ``radius`` (torch-cluster role) with static shapes: for each
    dst row, up to ``max_num_neighbors`` src rows within ``r``; returns
    (senders[src ids], receivers[dst ids], valid mask), each
    ``[N_dst * max_num_neighbors]`` — torch-cluster's cap has the same
    semantics (``radius(..., max_num_neighbors)``)."""
    d = pairwise_sqdist(x_dst, x_src)
    if batch_src is not None and batch_dst is not None:
        same = batch_dst[:, None] == batch_src[None, :]
        d = jnp.where(same, d, jnp.inf)
    sd, idx = _smallest_k(d, min(max_num_neighbors, x_src.shape[0]))
    valid = sd <= r * r
    k = idx.shape[1]
    receivers = jnp.repeat(jnp.arange(x_dst.shape[0], dtype=jnp.int32), k)
    return idx.reshape(-1).astype(jnp.int32), receivers, valid.reshape(-1)


def radius_graph(pos, r, batch=None, *, loop: bool = False,
                 max_num_neighbors: int = 32):
    """reference ``transforms/radius_graph.py`` role on device: (senders,
    receivers, valid) with the same conventions as :func:`knn_graph`."""
    n = pos.shape[0]
    d = pairwise_sqdist(pos, pos)
    if batch is not None:
        same = batch[:, None] == batch[None, :]
        d = jnp.where(same, d, jnp.inf)
    if not loop:
        d = d + jnp.diag(jnp.full((n,), jnp.inf, d.dtype))
    sd, idx = _smallest_k(d, min(max_num_neighbors, n))
    valid = sd <= r * r
    k = idx.shape[1]
    receivers = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    return idx.reshape(-1).astype(jnp.int32), receivers, valid.reshape(-1)


def fps(pos, *, ratio: float = 0.5, batch=None, start_idx: int = 0,
        num_samples: Optional[int] = None) -> jnp.ndarray:
    """Farthest point sampling — reference ``fps`` (torch-cluster role,
    PointNet++ downsampling).  Static output size (``num_samples`` or
    ``ceil(ratio * N)``); runs as a ``fori_loop`` on device.

    With ``batch`` (must be concrete — host-readable — like torch-cluster's
    ``fps(x, batch, ratio)``), sampling is per graph: graph ``g`` contributes
    ``ceil(ratio * n_g)`` picks (or its proportional share of
    ``num_samples``), each pick the farthest-from-picked point *within its
    own graph*; returned indices are grouped by graph, matching the
    torch-cluster output order."""
    n = pos.shape[0]
    d0 = pairwise_sqdist(pos, pos)

    if batch is None:
        m = num_samples if num_samples is not None else int(np.ceil(ratio * n))

        def body(i, state):
            picked, mind = state
            nxt = jnp.argmax(mind)  # farthest from the current picked set
            picked = picked.at[i].set(nxt.astype(jnp.int32))
            mind = jnp.minimum(mind, d0[nxt])
            mind = mind.at[nxt].set(-jnp.inf)
            return picked, mind

        picked0 = jnp.zeros(m, jnp.int32).at[0].set(start_idx)
        mind0 = d0[start_idx].at[start_idx].set(-jnp.inf)
        picked, _ = jax.lax.fori_loop(1, m, body, (picked0, mind0))
        return picked

    # Batched: cross-graph pairs must never limit the running min (+inf),
    # and each pick's argmax is masked to its scheduled target graph.
    b_host = np.asarray(batch)
    same = batch[:, None] == batch[None, :]
    d0 = jnp.where(same, d0, jnp.inf)
    graphs, counts = np.unique(b_host, return_counts=True)
    if num_samples is not None:
        # proportional share, largest-remainder rounding to hit the total
        shares = counts * (num_samples / counts.sum())
        per = np.floor(shares).astype(np.int64)
        rem = num_samples - int(per.sum())
        if rem > 0:
            order = np.argsort(-(shares - per))
            per[order[:rem]] += 1
        per = np.minimum(per, counts)
    else:
        per = np.ceil(ratio * counts).astype(np.int64)
    # pick-i → row of in_graph, grouped by graph (torch-cluster output order)
    target = jnp.asarray(np.repeat(np.arange(len(graphs)), per))
    m = int(per.sum())
    in_graph = batch[None, :] == jnp.asarray(graphs)[:, None]  # [G, N]

    def body(i, state):
        picked, mind = state
        # +inf mind within the target graph = "no pick in this graph yet";
        # argmax over the graph's nodes (others −inf so never chosen)
        cand = jnp.where(in_graph[target[i]], mind, -jnp.inf)
        nxt = jnp.argmax(cand)
        picked = picked.at[i].set(nxt.astype(jnp.int32))
        mind = jnp.minimum(mind, d0[nxt])
        mind = mind.at[nxt].set(-jnp.inf)
        return picked, mind

    picked0 = jnp.zeros(m, jnp.int32)
    mind0 = jnp.full((n,), jnp.inf, d0.dtype)
    picked, _ = jax.lax.fori_loop(0, m, body, (picked0, mind0))
    return picked

