"""Reorder dataset + SageOrderNet end-to-end (reference sage/testsage flow)."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import pad_to_bucket
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Reorder
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
    SageOrderNet,
    order_mse_loss,
    predicted_ordering,
)


def test_reorder_dataset_and_model(tmp_path):
    ds = Reorder(str(tmp_path / "Reorder"), 0, matrices_dir="data/matrices")
    assert len(ds) == 6  # TRAIN_IDS
    g = ds.get(0)
    assert g.y is not None and g.y.min() > 0 and g.y.max() < 1
    assert g.nodes.dtype == np.int32

    val = Reorder(str(tmp_path / "Reorder"), 1, matrices_dir="data/matrices")
    assert len(val) == 2
    names = val.graph_names(1)
    assert len(names) == 2

    gp = pad_to_bucket(g)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    model = SageOrderNet(hidden=16)
    scores, params = model.init_with_output(jax.random.key(0), gj)
    assert scores.shape == (gp.num_nodes,)
    assert float(scores.min()) >= 0 and float(scores.max()) <= 1
    loss = order_mse_loss(scores, gj)
    assert np.isfinite(float(loss))

    n = int(g.n_node[0])
    perm = predicted_ordering(scores, n)
    assert sorted(perm.tolist()) == list(range(n))
