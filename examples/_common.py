"""Shared example utilities: synthetic fallbacks so every example runs
without network access (the reference examples assume downloads)."""
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index


def synthetic_planetoid(n=500, f=64, classes=7, seed=0):
    """Cora-like: community graph whose labels correlate with structure."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n)
    centers = rng.normal(size=(classes, f)).astype(np.float32)
    x = centers[y] + 0.5 * rng.normal(size=(n, f)).astype(np.float32)
    # intra-class preferential edges
    s, r = [], []
    for _ in range(n * 5):
        a = rng.integers(0, n)
        if rng.random() < 0.8:
            same = np.nonzero(y == y[a])[0]
            b = int(rng.choice(same))
        else:
            b = int(rng.integers(0, n))
        if a != b:
            s += [a, b]
            r += [b, a]
    g = from_edge_index(x, np.stack([np.asarray(s), np.asarray(r)]), y=y.astype(np.int32))
    masks = {}
    idx = rng.permutation(n)
    masks["train"] = np.zeros(n, bool); masks["train"][idx[: n // 2]] = True
    masks["val"] = np.zeros(n, bool); masks["val"][idx[n // 2 : 3 * n // 4]] = True
    masks["test"] = np.zeros(n, bool); masks["test"][idx[3 * n // 4 :]] = True
    return g, masks
