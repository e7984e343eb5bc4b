"""DataParallel wrapper — reference nn/data_parallel.py API parity."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import pad_to_bucket
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import ReorderClassifier
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.data_parallel import DataParallel


def test_data_parallel_matches_serial(rng):
    def mk():
        n, e = int(rng.integers(6, 20)), int(rng.integers(10, 40))
        x = np.zeros((n, 5), np.float32)
        x[:, 2:] = rng.normal(size=(n, 3))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        return from_edge_index(x, ei, y=np.asarray([rng.integers(0, 4)], np.int64),
                               globals=rng.uniform(1, 50, (1, 10)).astype(np.float32))

    graphs = [mk() for _ in range(10)]
    model = ReorderClassifier(hidden=16, dropout_rate=0.0)
    g0 = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(graphs[0]))
    params = model.init(jax.random.key(0), g0)

    dp = DataParallel(model, params)
    outs = dp(graphs)
    assert sum(o.shape[0] for o in outs) == 10

    # serial reference per graph
    flat = [row for o in outs for row in np.asarray(o)]
    for i, g in enumerate(graphs):
        gp = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(g))
        ref = np.asarray(model.apply(params, gp))[0]
        np.testing.assert_allclose(flat[i], ref, rtol=1e-4, atol=1e-5, err_msg=str(i))
