"""GNNExplainer: the mask must identify the decisive edge on a toy task."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import gnn_explain


def test_explainer_finds_informative_edge(rng):
    # Node 0's class is determined by its neighbor 1's feature; edges from
    # nodes 2..5 are noise. The explainer should weight edge (1->0) highest.
    n, f = 6, 4
    x = np.zeros((n, f), np.float32)
    x[1, 0] = 5.0  # the signal
    x[2:, 1:] = rng.normal(size=(4, 3))
    senders = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    receivers = jnp.asarray([0, 0, 0, 0, 0], jnp.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, ew):
            h = GCNConv(f, 8, normalize=False)(x, senders, receivers, edge_weight=ew)
            return jax.nn.log_softmax(nn.Dense(2)(h))

    model = Net()
    xj = jnp.asarray(x)
    ones = jnp.ones(5)
    params = model.init(jax.random.key(0), xj, ones)
    # craft target: whatever class node 0 gets with all edges on
    pred = int(model.apply(params, xj, ones)[0].argmax())

    res = gnn_explain(
        lambda xm, em: model.apply(params, xm, em),
        xj, jnp.asarray(pred), 5, node_idx=0, epochs=150, lr=0.05,
    )
    em = np.asarray(res.edge_mask)
    assert em.shape == (5,)
    assert em[0] > 0.9           # the signal edge (1->0) is kept
    assert em.min() < 0.1        # uninformative edges are pruned
    assert np.isfinite(np.asarray(res.losses)).all()
