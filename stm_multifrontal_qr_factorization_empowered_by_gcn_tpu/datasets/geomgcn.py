"""Geom-GCN node-classification benchmarks + Wiki-CS — reference
``torch_geometric/datasets/{webkb,wikipedia_network,actor,wikics}.py``.

WebKB / WikipediaNetwork / Actor share one raw contract (the geom-gcn
repo layout): ``out1_node_feature_label.txt`` (tab-separated id /
comma-separated features / label), ``out1_graph_edges.txt`` (tab-separated
edge list), and ten ``*_split_0.6_0.2_{i}.npz`` mask files.  The edge list
is coalesced exactly like the reference (``webkb.py:78-83``); the ten
splits are stacked into ``split_masks['train'|'val'|'test']`` of shape
``(N, 10)`` (the reference's stacked ``train_mask`` etc.).

WikiCS keeps the reference's single ``data.json`` contract
(``wikics.py:44-72``): features/labels/adjacency lists plus 20 training
splits, a stopping mask per split, and one shared test mask."""
from __future__ import annotations

import json
import os.path as osp

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph


def _coalesce_edges(rows, cols, n):
    """Sorted unique directed edges (the reference's ``coalesce`` role)."""
    key = np.asarray(rows, np.int64) * n + np.asarray(cols, np.int64)
    key = np.unique(key)
    return (key // n).astype(np.int32), (key % n).astype(np.int32)


class _GeomGCNDataset(InMemoryDataset):
    """Shared body for the geom-gcn raw layout."""

    url = "https://raw.githubusercontent.com/graphdml-uiuc-jlu/geom-gcn/master"
    #: subdirectory under ``new_data/`` and split-file prefix
    raw_name: str = ""
    #: True = features are a comma-separated dense vector per node;
    #: False = features are comma-separated *indices* of a bag of words
    #: (the Actor format, ``actor.py:56-63``)
    dense_features: bool = True

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        self.split_masks = dict(np.load(self.processed_paths[1]))

    @property
    def raw_file_names(self):
        return ["out1_node_feature_label.txt", "out1_graph_edges.txt"] + [
            f"{self.raw_name}_split_0.6_0.2_{i}.npz" for i in range(10)
        ]

    @property
    def processed_file_names(self):
        return ["data.npz", "masks.npz"]

    def download(self):
        for f in self.raw_file_names[:2]:
            download_url(f"{self.url}/new_data/{self.raw_name}/{f}",
                         self.raw_dir)
        for f in self.raw_file_names[2:]:
            download_url(f"{self.url}/splits/{f}", self.raw_dir)

    def process(self):
        with open(self.raw_paths[0]) as f:
            rows = [r.split("\t") for r in f.read().split("\n")[1:-1]]
        if self.dense_features:
            x = np.asarray(
                [[float(v) for v in r[1].split(",")] for r in rows],
                np.float32)
            y = np.asarray([int(r[2]) for r in rows], np.int32)
        else:
            n = len(rows)
            dim = max(int(v) for r in rows for v in r[1].split(",")) + 1
            x = np.zeros((n, dim), np.float32)
            y = np.empty(n, np.int32)
            for nid, feat, label in rows:
                x[int(nid), [int(v) for v in feat.split(",")]] = 1.0
                y[int(nid)] = int(label)

        with open(self.raw_paths[1]) as f:
            erows = [r.split("\t") for r in f.read().split("\n")[1:-1]]
        s, r = _coalesce_edges([int(e[0]) for e in erows],
                               [int(e[1]) for e in erows], x.shape[0])

        masks = {k: [] for k in ("train", "val", "test")}
        for path in self.raw_paths[2:]:
            z = np.load(path)
            for k in masks:
                masks[k].append(z[f"{k}_mask"].astype(bool))
        masks = {k: np.stack(v, axis=1) for k, v in masks.items()}

        g = Graph(
            nodes=x, senders=s, receivers=r,
            n_node=np.asarray([x.shape[0]], np.int32),
            n_edge=np.asarray([len(s)], np.int32),
            y=y,
        )
        self.save_split([g], self.processed_paths[0])
        np.savez(self.processed_paths[1], **masks)


class WebKB(_GeomGCNDataset):
    """reference ``webkb.py`` — Cornell/Texas/Wisconsin web pages,
    5 classes."""

    def __init__(self, root, name, transform=None, pre_transform=None):
        self.raw_name = name.lower()
        assert self.raw_name in ("cornell", "texas", "wisconsin")
        super().__init__(osp.join(root, self.raw_name), transform,
                         pre_transform)


class WikipediaNetwork(_GeomGCNDataset):
    """reference ``wikipedia_network.py`` — chameleon/squirrel page-page
    networks, 5 traffic classes."""

    def __init__(self, root, name, transform=None, pre_transform=None):
        self.raw_name = name.lower()
        assert self.raw_name in ("chameleon", "squirrel")
        super().__init__(osp.join(root, self.raw_name), transform,
                         pre_transform)


class Actor(_GeomGCNDataset):
    """reference ``actor.py`` — actor co-occurrence graph (the geom-gcn
    ``film`` split), sparse keyword-index features."""

    raw_name = "film"
    dense_features = False


class WikiCS(InMemoryDataset):
    """reference ``wikics.py`` — 11.7k Wikipedia CS articles, 10 classes,
    20 standard training splits (stacked into ``split_masks``; the shared
    test mask is 1-D)."""

    url = "https://github.com/pmernyei/wiki-cs-dataset/raw/master/dataset"

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        self.split_masks = dict(np.load(self.processed_paths[1]))

    @property
    def raw_file_names(self):
        return ["data.json"]

    @property
    def processed_file_names(self):
        return ["data.npz", "masks.npz"]

    def download(self):
        download_url(f"{self.url}/data.json", self.raw_dir)

    def process(self):
        with open(self.raw_paths[0]) as f:
            data = json.load(f)
        x = np.asarray(data["features"], np.float32)
        y = np.asarray(data["labels"], np.int32)
        s = np.asarray(
            [i for i, js in enumerate(data["links"]) for _ in js], np.int32)
        r = np.asarray(
            [j for js in data["links"] for j in js], np.int32)
        g = Graph(
            nodes=x, senders=s, receivers=r,
            n_node=np.asarray([x.shape[0]], np.int32),
            n_edge=np.asarray([len(s)], np.int32),
            y=y,
        )
        self.save_split([g], self.processed_paths[0])
        np.savez(
            self.processed_paths[1],
            train=np.asarray(data["train_masks"], bool).T,
            val=np.asarray(data["val_masks"], bool).T,
            stopping=np.asarray(data["stopping_masks"], bool).T,
            test=np.asarray(data["test_mask"], bool),
        )
