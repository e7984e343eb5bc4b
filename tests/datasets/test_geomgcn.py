"""WebKB/WikipediaNetwork/Actor/WikiCS over synthesized raw files —
reference ``datasets/{webkb,wikipedia_network,actor,wikics}.py``."""
import json

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    Actor,
    WebKB,
    WikiCS,
    WikipediaNetwork,
)


def _write_geomgcn_raw(raw, prefix, n=8, f=4, sparse_features=False):
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = ["node_id\tfeature\tlabel"]
    for i in range(n):
        if sparse_features:
            feat = ",".join(str(v) for v in sorted(
                rng.choice(f, size=2, replace=False)))
        else:
            feat = ",".join(f"{v:.3f}" for v in rng.normal(size=f))
        lines.append(f"{i}\t{feat}\t{int(rng.integers(0, 5))}")
    (raw / "out1_node_feature_label.txt").write_text("\n".join(lines) + "\n")
    edges = ["src\tdst"] + [f"{i}\t{(i + 1) % n}" for i in range(n)] \
        + ["0\t1"]  # duplicate to exercise coalesce
    (raw / "out1_graph_edges.txt").write_text("\n".join(edges) + "\n")
    for i in range(10):
        tr = np.zeros(n, bool)
        tr[: n // 2] = True
        va = np.zeros(n, bool)
        va[n // 2: 3 * n // 4] = True
        te = ~(tr | va)
        np.savez(raw / f"{prefix}_split_0.6_0.2_{i}.npz",
                 train_mask=tr, val_mask=va, test_mask=te)


def test_webkb_local_raw(tmp_path):
    _write_geomgcn_raw(tmp_path / "texas" / "raw", "texas")
    ds = WebKB(str(tmp_path), "texas")
    g = ds.get(0)
    assert g.nodes.shape == (8, 4)
    assert int(g.n_edge[0]) == 8  # 9 raw edges, 1 duplicate coalesced
    assert ds.split_masks["train"].shape == (8, 10)


def test_wikipedia_network_local_raw(tmp_path):
    _write_geomgcn_raw(tmp_path / "chameleon" / "raw", "chameleon")
    ds = WikipediaNetwork(str(tmp_path), "chameleon")
    assert ds.get(0).y.shape == (8,)


def test_actor_sparse_features(tmp_path):
    _write_geomgcn_raw(tmp_path / "raw", "film", sparse_features=True)
    ds = Actor(str(tmp_path))
    g = ds.get(0)
    # bag-of-keyword indices become a 0/1 matrix (actor.py:56-63)
    assert set(np.unique(g.nodes)) <= {0.0, 1.0}
    assert (g.nodes.sum(axis=1) == 2).all()


def test_wikics_local_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    n = 6
    rng = np.random.default_rng(0)
    data = {
        "features": rng.normal(size=(n, 3)).tolist(),
        "labels": rng.integers(0, 4, n).tolist(),
        "links": [[(i + 1) % n, (i + 2) % n] for i in range(n)],
        "train_masks": [[True] * 3 + [False] * 3 for _ in range(20)],
        "val_masks": [[False] * 3 + [True, False, False]
                      for _ in range(20)],
        "stopping_masks": [[False] * 4 + [True, False]
                           for _ in range(20)],
        "test_mask": [False] * 5 + [True],
    }
    with open(raw / "data.json", "w") as f:
        json.dump(data, f)
    ds = WikiCS(str(tmp_path))
    g = ds.get(0)
    assert int(g.n_edge[0]) == 2 * n
    assert ds.split_masks["train"].shape == (n, 20)
    assert ds.split_masks["test"].shape == (n,)
