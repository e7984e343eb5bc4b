"""GraphSAINT benchmark graphs — reference ``torch_geometric/datasets/
{flickr,yelp}.py``.

Both keep the reference's raw contract (the GraphSAINT release format:
``adj_full.npz`` CSR adjacency + ``feats.npy`` + ``class_map.json`` +
``role.json``) and the reference's processing (features as-is, labels from
the class map, boolean train/val/test masks from the role lists,
``flickr.py:59-92``).  Masks live in ``split_masks`` like :class:`Reddit`."""
from __future__ import annotations

import json
import os.path as osp

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.graph import Graph


class _SaintDataset(InMemoryDataset):
    """Shared body for the GraphSAINT-format single-graph collections."""

    #: reference: Google-Drive file ids (``flickr.py:28-31``); kept for
    #: provenance — this no-egress build routes through local raw files.
    drive_ids: dict = {}

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        self.split_masks = dict(np.load(self.processed_paths[1]))

    @property
    def raw_file_names(self):
        return ["adj_full.npz", "feats.npy", "class_map.json", "role.json"]

    @property
    def processed_file_names(self):
        return ["data.npz", "masks.npz"]

    def download(self):
        raise RuntimeError(
            f"{self.__class__.__name__} is hosted on Google Drive "
            f"(ids {self.drive_ids}); place "
            f"{self.raw_file_names} under {self.raw_dir}"
        )

    def process(self):
        import scipy.sparse as sp

        f = np.load(osp.join(self.raw_dir, "adj_full.npz"))
        adj = sp.csr_matrix(
            (f["data"], f["indices"], f["indptr"]), f["shape"]
        ).tocoo()
        x = np.load(osp.join(self.raw_dir, "feats.npy")).astype(np.float32)
        n = x.shape[0]

        with open(osp.join(self.raw_dir, "class_map.json")) as fh:
            class_map = json.load(fh)
        first = next(iter(class_map.values()))
        if isinstance(first, list):  # multi-label (Yelp)
            y = np.full((n, len(first)), -1, np.float32)
        else:  # single-label (Flickr)
            y = np.full((n,), -1, np.int32)
        for key, item in class_map.items():
            y[int(key)] = item

        with open(osp.join(self.raw_dir, "role.json")) as fh:
            role = json.load(fh)
        masks = {}
        for name, key in (("train", "tr"), ("val", "va"), ("test", "te")):
            m = np.zeros(n, bool)
            m[np.asarray(role[key], np.int64)] = True
            masks[name] = m

        g = Graph(
            nodes=x,
            senders=adj.row.astype(np.int32),
            receivers=adj.col.astype(np.int32),
            n_node=np.asarray([n], np.int32),
            n_edge=np.asarray([adj.nnz], np.int32),
            y=y,
        )
        self.save_split([g], self.processed_paths[0])
        np.savez(self.processed_paths[1], **masks)


class Flickr(_SaintDataset):
    """reference ``flickr.py`` — 89k image-description nodes, 7 classes."""

    drive_ids = {
        "adj_full.npz": "1crmsTbd1-2sEXsGwa2IKnIB7Zd3TmUsy",
        "feats.npy": "1join-XdvX3anJU_MLVtick7MgeAQiWIZ",
        "class_map.json": "1uxIkbtg5drHTsKt-PAsZZ4_yJmgFmle9",
        "role.json": "1htXCtuktuCW8TR8KiKfrFDAxUgekQoV7",
    }


class Yelp(_SaintDataset):
    """reference ``yelp.py`` — 717k reviewer nodes, 100 multi-labels."""

    drive_ids = {
        "adj_full.npz": "1Juwx8HtDwSzmVIJ31ooVa1WljI4U5JnA",
        "feats.npy": "1Zy6BZH_zLEjKlEFSduKE5tV9qqA_8VtM",
        "class_map.json": "1VUcBGr0T0-klqerjAjxRmAqFuld_SMWU",
        "role.json": "1NI5pa5Chpd-52eSmLW60OnB3WS5ikxq_",
    }
