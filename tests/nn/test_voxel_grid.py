"""voxel_grid parity: floor-divide voxel ids must match a NumPy replica of
``torch_cluster.grid_cluster`` semantics (reference ``nn/pool/voxel_grid.py``)."""
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool.voxel_grid import (
    voxel_grid,
)


def _ref_grid(pos, batch, size):
    """grid_cluster replica: batch appended as extra dim of size 1."""
    pos = np.concatenate([pos, batch[:, None].astype(pos.dtype)], axis=1)
    size = np.array(list(size) + [1.0])
    start = pos.min(0)
    end = pos.max(0)
    coords = np.floor((pos - start) / size).astype(np.int64)
    dims = (np.floor((end - start) / size) + 1).astype(np.int64)
    coords = np.clip(coords, 0, dims - 1)
    strides = np.concatenate([np.cumprod(dims[::-1])[::-1][1:], [1]])
    return (coords * strides).sum(1)


def test_voxel_grid_matches_reference_semantics(rng):
    pos = rng.uniform(-3, 3, size=(50, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, 3, size=50)).astype(np.int32)
    ref = _ref_grid(pos, batch, [0.7, 0.7, 0.7])
    got = np.asarray(
        voxel_grid(jnp.asarray(pos), jnp.asarray(batch), 0.7, num_graphs=3)
    )
    # same partition (ids may differ by the batch-axis stride layout)
    ref_groups = {}
    for i, c in enumerate(ref):
        ref_groups.setdefault(c, set()).add(i)
    got_groups = {}
    for i, c in enumerate(got):
        got_groups.setdefault(c, set()).add(i)
    assert set(map(frozenset, ref_groups.values())) == set(
        map(frozenset, got_groups.values())
    )


def test_voxel_grid_consecutive_and_mask(rng):
    pos = rng.uniform(0, 4, size=(20, 2)).astype(np.float32)
    batch = np.zeros(20, np.int32)
    mask = np.arange(20) < 16
    got = np.asarray(
        voxel_grid(
            jnp.asarray(pos), jnp.asarray(batch), 1.0,
            node_mask=jnp.asarray(mask), num_graphs=1, consecutive=True,
        )
    )
    ks = np.unique(got[:16])
    assert ks.min() == 0 and np.array_equal(ks, np.arange(len(ks)))
    # padding nodes share the top (invalid) cluster
    assert (got[16:] > got[:16].max()).all() or len(np.unique(got[16:])) == 1


def test_voxel_grid_never_spans_graphs(rng):
    pos = rng.uniform(0, 1, size=(30, 3)).astype(np.float32)  # all in 1 voxel
    batch = np.sort(rng.integers(0, 3, size=30)).astype(np.int32)
    got = np.asarray(voxel_grid(jnp.asarray(pos), jnp.asarray(batch), 10.0, num_graphs=3))
    for c in np.unique(got):
        assert len(np.unique(batch[got == c])) == 1
