"""SAGEConv: sampler-block reshape fast path vs generic edge path."""
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv




def test_sage_block_fast_path_matches_edge_path():
    """Sampler-block reshape aggregation == generic propagate on the same
    edges, for mean/add/max, including masked (zero-degree) seeds."""
    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.sampler import (
        NeighborSampler,
    )

    rng = np.random.default_rng(0)
    n, e, f = 40, 150, 6
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    # leave some nodes without in-edges so edge_mask has False entries
    r[r == 7] = 8
    sampler = NeighborSampler(s, r, n, sizes=[4], batch_size=10, seed=1)
    seeds, (blk,) = next(iter(sampler))

    x_src = jnp.asarray(rng.normal(size=(blk.src_ids.shape[0], f)).astype(np.float32))
    x_dst = x_src[: blk.num_dst]
    for aggr in ["mean", "add", "max"]:
        conv = SAGEConv((f, f), 5, aggr=aggr)
        params = conv.init(jax.random.PRNGKey(0), (x_src, x_dst), blk)
        out_blk = conv.apply(params, (x_src, x_dst), blk)
        out_edges = conv.apply(
            params, (x_src, x_dst), blk.senders, blk.receivers,
            num_nodes=blk.num_dst, edge_mask=blk.edge_mask)
        np.testing.assert_allclose(
            np.asarray(out_blk), np.asarray(out_edges), atol=1e-5)
