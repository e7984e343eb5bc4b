#!/usr/bin/env python
"""SPMD data-parallel + edge-partition training over a device mesh —
reference ``examples/multi_gpu/{data_parallel,distributed_sampling}.py``.
Run on CPU with 8 virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/multi_chip_data_parallel.py --cpu
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import batch_graphs, pad_graph
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
    ReorderClassifier, masked_accuracy, masked_nll_loss)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel import (
    make_mesh, make_spmd_eval_step, make_spmd_train_step, mesh_factors, stack_shards)


def main():
    rng = np.random.default_rng(0)
    def mk():
        n, e = int(rng.integers(8, 30)), int(rng.integers(16, 60))
        x = np.zeros((n, 5), np.float32); x[:, 2:] = rng.normal(size=(n, 3))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        return from_edge_index(x, ei, y=np.asarray([rng.integers(0, 4)], np.int64),
                               globals=rng.uniform(1, 100, (1, 10)).astype(np.float32))

    nd = len(jax.devices())
    data, graph = mesh_factors(nd)
    mesh = make_mesh(data=data, graph=graph)
    print(f"mesh: data={data} graph={graph} over {nd} devices")

    shards = [
        pad_graph(batch_graphs([mk() for _ in range(4)]), num_nodes=256,
                  num_edges=512, num_graphs=5)
        for _ in range(data)
    ]
    stacked = stack_shards(shards)
    model = ReorderClassifier(hidden=32)
    tx = optax.adam(3e-3)
    ex = jax.tree_util.tree_map(jnp.asarray, shards[0])
    params = model.init(jax.random.key(0), ex)
    opt = tx.init(params)

    step = make_spmd_train_step(model, tx, mesh, masked_nll_loss)
    ev = make_spmd_eval_step(model, mesh, masked_accuracy)
    key = jax.random.key(1)
    t0 = time.time()
    for epoch in range(60):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, stacked, sub)
        if epoch % 20 == 0:
            c, t = ev(params, stacked)
            print(f"epoch {epoch}: loss={float(loss):.4f} acc={int(c)}/{int(t)} "
                  f"[{time.time()-t0:.1f}s]")
    c, t = ev(params, stacked)
    print(f"final train accuracy {int(c)}/{int(t)}")


if __name__ == "__main__":
    main()
