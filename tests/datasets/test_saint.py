"""Flickr/Yelp over synthesized GraphSAINT raw files — reference
``datasets/{flickr,yelp}.py``."""
import json

import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    Flickr,
    Yelp,
)


def _write_saint_raw(raw, n=12, f=5, multilabel=False):
    import scipy.sparse as sp

    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    adj = sp.random(n, n, density=0.3, random_state=1, format="csr")
    np.savez(raw / "adj_full.npz", data=adj.data, indices=adj.indices,
             indptr=adj.indptr, shape=np.asarray(adj.shape))
    np.save(raw / "feats.npy", rng.normal(size=(n, f)).astype(np.float32))
    if multilabel:
        cmap = {str(i): rng.integers(0, 2, 3).tolist() for i in range(n)}
    else:
        cmap = {str(i): int(rng.integers(0, 4)) for i in range(n)}
    with open(raw / "class_map.json", "w") as fh:
        json.dump(cmap, fh)
    with open(raw / "role.json", "w") as fh:
        json.dump({"tr": list(range(6)), "va": [6, 7, 8],
                   "te": [9, 10, 11]}, fh)
    return adj, cmap


def test_flickr_local_raw(tmp_path):
    adj, cmap = _write_saint_raw(tmp_path / "raw")
    ds = Flickr(str(tmp_path))
    g = ds.get(0)
    assert int(g.n_node[0]) == 12 and g.nodes.shape == (12, 5)
    assert int(g.n_edge[0]) == adj.nnz
    assert g.y.shape == (12,) and int(g.y[3]) == cmap["3"]
    assert ds.split_masks["train"].sum() == 6
    assert ds.split_masks["val"].sum() == 3
    assert ds.split_masks["test"].sum() == 3


def test_yelp_multilabel(tmp_path):
    _write_saint_raw(tmp_path / "raw", multilabel=True)
    ds = Yelp(str(tmp_path))
    g = ds.get(0)
    assert g.y.shape == (12, 3)  # multi-label matrix


def test_download_mentions_drive(tmp_path):
    with pytest.raises(RuntimeError, match="Google Drive"):
        Flickr(str(tmp_path / "nodata"))
