"""Temporal event-stream datasets — reference ``torch_geometric/datasets/
{icews,gdelt,bitcoin_otc,jodie}.py``.

* :class:`ICEWS18` / :class:`GDELT` keep the RE-Net raw contract
  (``{train,valid,test}.txt`` tab-separated ``sub rel obj t`` quadruples,
  time renormalized to the dataset granularity and min-shifted,
  ``icews.py:22-35,95-101``).  Events land in a :class:`TemporalData`
  (``src``=sub, ``dst``=obj, ``y``=rel, ``t``) per split — the columnar
  equivalent of the reference's one-Data-per-event list.
* :class:`BitcoinOTC` keeps the SNAP csv contract and the reference's
  windowing (138 graphs at 13.8-day steps, ``edge_window_size`` trailing
  windows, ``bitcoin_otc.py:59-92``); trust ratings are edge attributes.
* :class:`JODIEDataset` keeps the JODIE csv contract (user, item, t,
  state label, message features; items offset past users,
  ``jodie.py:38-50``).
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from ..data.dataset import Dataset, InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph
from ..data.temporal import TemporalData


class _EventDataset(Dataset):
    """Shared RE-Net quadruple-stream body (reference ``icews.py:7-36``)."""

    url: str = ""
    splits = [0, 0, 0, 0]
    time_div = 1

    def __init__(self, root, split: str = "train", transform=None,
                 pre_transform=None, pre_filter=None):
        assert split in ("train", "val", "test")
        self._split = split
        super().__init__(root, transform, pre_transform, pre_filter)
        z = np.load(
            self.processed_paths[("train", "val", "test").index(split)])
        self.data = TemporalData(src=z["sub"], dst=z["obj"], t=z["t"],
                                 y=z["rel"])

    @property
    def raw_file_names(self):
        return [f"{name}.txt" for name in ("train", "valid", "test")]

    @property
    def processed_file_names(self):
        return ["train.npz", "val.npz", "test.npz"]

    def download(self):
        for f in self.raw_file_names:
            download_url(f"{self.url}/{f}", self.raw_dir)

    def process(self):
        events = []
        for path in self.raw_paths:
            rows = np.loadtxt(path, dtype=np.int64, usecols=(0, 1, 2, 3),
                              ndmin=2)
            rows[:, 3] //= self.time_div
            events.append(rows)
        events = np.concatenate(events, axis=0)
        events = events - events.min(axis=0, keepdims=True)
        s = self.splits
        for i in range(3):
            part = events[s[i]:s[i + 1]]
            np.savez(self.processed_paths[i], sub=part[:, 0],
                     rel=part[:, 1], obj=part[:, 2], t=part[:, 3])

    def len(self):
        return self.data.num_events

    def get(self, idx):
        return self.data[int(idx)]


class ICEWS18(_EventDataset):
    """reference ``icews.py:39-110`` — 2018 ICEWS events, 24h buckets."""

    url = "https://github.com/INK-USC/RE-Net/raw/master/data/ICEWS18"
    splits = [0, 373018, 419013, 468558]
    time_div = 24
    num_nodes = 23033
    num_rels = 256


class GDELT(_EventDataset):
    """reference ``gdelt.py`` — Jan-2018 GDELT events, 15-min buckets."""

    url = "https://github.com/INK-USC/RENet/raw/master/data/GDELT"
    splits = [0, 1734399, 1973164, 2278405]
    time_div = 15
    num_nodes = 7691
    num_rels = 240


class BitcoinOTC(InMemoryDataset):
    """reference ``bitcoin_otc.py`` — 138 who-trusts-whom snapshots.
    Each graph holds the trailing ``edge_window_size`` windows' edges;
    ratings are integer edge attributes.  All graphs share the global node
    count (like the reference's ``data.num_nodes``)."""

    url = "https://snap.stanford.edu/data/soc-sign-bitcoinotc.csv.gz"
    _step = 13.8 * 24 * 3600  # reference: timedelta(days=13.8)

    def __init__(self, root, edge_window_size: int = 10, transform=None,
                 pre_transform=None):
        self.edge_window_size = edge_window_size
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["soc-sign-bitcoinotc.csv"]

    @property
    def processed_file_names(self):
        return [f"data_w{self.edge_window_size}.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        rows = np.loadtxt(self.raw_paths[0], delimiter=",", ndmin=2)
        edge_index = rows[:, :2].astype(np.int64)
        edge_index -= edge_index.min()
        num_nodes = int(edge_index.max()) + 1
        rating = rows[:, 2].astype(np.int32)
        stamps = rows[:, 3].astype(np.float64)

        graph_idx = np.minimum(
            np.floor((stamps - stamps[0]) / self._step), 137
        ).astype(np.int64)
        graph_idx = np.maximum(graph_idx, 0)

        graphs = []
        for i in range(int(graph_idx.max()) + 1):
            mask = (graph_idx > (i - self.edge_window_size)) \
                & (graph_idx <= i)
            graphs.append(Graph(
                nodes=np.zeros((num_nodes, 1), np.float32),
                senders=edge_index[mask, 0].astype(np.int32),
                receivers=edge_index[mask, 1].astype(np.int32),
                n_node=np.asarray([num_nodes], np.int32),
                n_edge=np.asarray([int(mask.sum())], np.int32),
                edges=rating[mask],
            ))
        self.save_split(graphs, self.processed_paths[0])


class JODIEDataset(Dataset):
    """reference ``jodie.py`` — Reddit/Wikipedia/MOOC/LastFM interaction
    streams as :class:`TemporalData` (items offset past users)."""

    url = "http://snap.stanford.edu/jodie/{}.csv"
    names = ("reddit", "wikipedia", "mooc", "lastfm")

    def __init__(self, root, name: str, transform=None, pre_transform=None):
        self.name = name.lower()
        assert self.name in self.names
        super().__init__(osp.join(root, self.name), transform, pre_transform)
        z = np.load(self.processed_paths[0])
        self.data = TemporalData(src=z["src"], dst=z["dst"], t=z["t"],
                                 msg=z["msg"], y=z["y"])

    @property
    def raw_file_names(self):
        return [f"{self.name}.csv"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url.format(self.name), self.raw_dir)

    def process(self):
        with open(self.raw_paths[0]) as f:
            lines = f.read().strip().split("\n")[1:]  # skip header
        cells = [ln.split(",") for ln in lines]
        src = np.asarray([int(c[0]) for c in cells], np.int64)
        dst = np.asarray([int(c[1]) for c in cells], np.int64)
        dst += int(src.max()) + 1  # bipartite offset (jodie.py:43)
        t = np.asarray([float(c[2]) for c in cells]).astype(np.int64)
        y = np.asarray([int(float(c[3])) for c in cells], np.int64)
        msg = np.asarray([[float(v) for v in c[4:]] for c in cells],
                         np.float32)
        np.savez(self.processed_paths[0], src=src, dst=dst, t=t, y=y,
                 msg=msg)

    def len(self):
        return self.data.num_events

    def get(self, idx):
        return self.data[int(idx)]
