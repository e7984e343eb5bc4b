"""PNAConv parity vs numpy (reference
``torch_geometric/nn/conv/pna_conv.py``): aggregators × degree scalers."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import PNAConv


def test_pna_matches_numpy(small_graph):
    s, r, x = small_graph
    out = 5
    deg_avg_log = 1.3
    layer = PNAConv(8, out, aggregators=("mean", "min", "max", "std"),
                    scalers=("identity", "amplification", "attenuation"),
                    deg_avg_log=deg_avg_log)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    h = x @ p["pre"]
    deg = np.zeros(4)
    np.add.at(deg, r, 1.0)

    def seg(vals, red):
        o = np.zeros((4, vals.shape[1]), np.float32)
        for i in range(4):
            rows = vals[r == i]
            if len(rows):
                o[i] = red(rows, axis=0)
        return o

    mean = seg(h[s], np.mean)
    mn = seg(h[s], np.min)
    mx = seg(h[s], np.max)
    sq = seg(h[s] ** 2, np.mean)
    std = np.sqrt(np.maximum(sq - mean**2, 0) + 1e-5)
    stacked = np.concatenate([mean, mn, mx, std], -1)

    log_deg = np.log(deg + 1)
    feats = np.concatenate([
        stacked,
        stacked * (log_deg / deg_avg_log)[:, None],
        stacked * (deg_avg_log / np.maximum(log_deg, 1e-5))[:, None],
    ], -1)
    ref = feats @ p["post"] + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-4)
