"""Public benchmark dataset classes — reference ``torch_geometric/datasets/
{amazon,coauthor,citation_full,reddit,modelnet,faust,ppi}.py``.

Each class keeps the reference's URL + raw-file contract and processes raw
files with this package's readers (``io.read_npz``/``read_off``/``read_ply``)
into cached collated npz splits.  In this no-egress image ``download()``
raises a clear message pointing at the local-raw-files route (the same
files a user of the reference would have on disk)."""
from __future__ import annotations

import glob
import json
import os.path as osp
from typing import Optional

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.download import download_url, extract_zip
from ..data.graph import Graph
from ..io.readers import read_npz, read_off, read_ply


class _NpzGraphDataset(InMemoryDataset):
    """Shared body for the single-graph npz collections."""

    url: str = ""

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url + self.raw_file_names[0], self.raw_dir)

    def process(self):
        g = read_npz(osp.join(self.raw_dir, self.raw_file_names[0]))
        self.save_split([g], self.processed_paths[0])


class Amazon(_NpzGraphDataset):
    """reference ``amazon.py`` — Computers / Photo co-purchase graphs."""

    url = "https://github.com/shchur/gnn-benchmark/raw/master/data/npz/"

    def __init__(self, root, name: str, transform=None, pre_transform=None):
        assert name.lower() in ("computers", "photo")
        self.name = name.lower()
        super().__init__(osp.join(root, self.name), transform, pre_transform)

    @property
    def raw_file_names(self):
        return [f"amazon_electronics_{self.name}.npz"]


class Coauthor(_NpzGraphDataset):
    """reference ``coauthor.py`` — CS / Physics co-authorship graphs."""

    url = "https://github.com/shchur/gnn-benchmark/raw/master/data/npz/"

    def __init__(self, root, name: str, transform=None, pre_transform=None):
        assert name.lower() in ("cs", "physics")
        self.name = "cs" if name.lower() == "cs" else "phy"
        super().__init__(osp.join(root, self.name), transform, pre_transform)

    @property
    def raw_file_names(self):
        return [f"ms_academic_{self.name}.npz"]


class CitationFull(_NpzGraphDataset):
    """reference ``citation_full.py`` — full Cora/Cora-ML/CiteSeer/DBLP/
    PubMed citation graphs (graph2gauss npz format)."""

    url = "https://github.com/abojchevski/graph2gauss/raw/master/data/"

    def __init__(self, root, name: str, transform=None, pre_transform=None):
        self.name = name.lower()
        assert self.name in ("cora", "cora_ml", "citeseer", "dblp", "pubmed")
        super().__init__(osp.join(root, self.name), transform, pre_transform)

    @property
    def raw_file_names(self):
        return [f"{self.name}.npz"]


class CoraFull(CitationFull):
    """reference ``citation_full.py:66-76`` — alias for the full Cora
    citation graph (``CitationFull(root, 'cora')``)."""

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, "cora", transform, pre_transform)


class Reddit(InMemoryDataset):
    """reference ``reddit.py`` — 233k-node post-to-post graph
    (``reddit_data.npz`` features/labels + ``reddit_graph.npz`` sparse adj)."""

    url = "https://data.dgl.ai/dataset/reddit.zip"

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        self.split_masks = dict(np.load(self.processed_paths[1]))

    @property
    def raw_file_names(self):
        return ["reddit_data.npz", "reddit_graph.npz"]

    @property
    def processed_file_names(self):
        return ["data.npz", "masks.npz"]

    def download(self):
        path = download_url(self.url, self.raw_dir)
        extract_zip(path, self.raw_dir)

    def process(self):
        import scipy.sparse as sp

        data = np.load(osp.join(self.raw_dir, "reddit_data.npz"))
        adj = sp.load_npz(osp.join(self.raw_dir, "reddit_graph.npz")).tocoo()
        x = data["feature"].astype(np.float32)
        y = data["label"].astype(np.int32)
        types = data["node_types"]  # 1 train / 2 val / 3 test
        g = Graph(
            nodes=x,
            senders=adj.col.astype(np.int32),
            receivers=adj.row.astype(np.int32),
            n_node=np.asarray([x.shape[0]], np.int32),
            n_edge=np.asarray([adj.nnz], np.int32),
            y=y,
        )
        self.save_split([g], self.processed_paths[0])
        np.savez(self.processed_paths[1], train=types == 1, val=types == 2,
                 test=types == 3)


class ModelNet(InMemoryDataset):
    """reference ``modelnet.py`` — ModelNet10/40 mesh classification; raw
    layout ``raw/<category>/{train,test}/*.off``."""

    urls = {
        "10": "http://vision.princeton.edu/projects/2014/3DShapeNets/ModelNet10.zip",
        "40": "http://modelnet.cs.princeton.edu/ModelNet40.zip",
    }

    def __init__(self, root, name: str = "10", train: bool = True,
                 transform=None, pre_transform=None, pre_filter=None):
        assert name in ("10", "40")
        self.name = name
        self._split = "train" if train else "test"
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(
            self.processed_paths[0 if self._split == "train" else 1])

    @property
    def raw_file_names(self):
        return ["categories.ok"]  # marker: categories extracted under raw/

    @property
    def processed_file_names(self):
        return ["train.npz", "test.npz"]

    def download(self):
        path = download_url(self.urls[self.name], self.raw_dir)
        extract_zip(path, self.raw_dir)
        with open(osp.join(self.raw_dir, "categories.ok"), "w") as f:
            f.write("ok")

    def process(self):
        cats = sorted(
            d for d in glob.glob(osp.join(self.raw_dir, "*"))
            if osp.isdir(d)
        )
        for si, split in enumerate(("train", "test")):
            graphs = []
            for label, cat in enumerate(cats):
                for path in sorted(glob.glob(osp.join(cat, split, "*.off"))):
                    g = read_off(path)
                    graphs.append(g._replace(
                        y=np.asarray([label], np.int32)))
            self.save_split(graphs, self.processed_paths[si])


class FAUST(InMemoryDataset):
    """reference ``faust.py`` — 100 registered human scans (10 poses × 10
    subjects); correspondence target = vertex id (every mesh shares the
    template topology).  Raw = ``MPI-FAUST/training/registrations/
    tr_reg_*.ply`` (registration-gated download, like the reference)."""

    url = "http://faust.is.tue.mpg.de/"

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None):
        self._split = "train" if train else "test"
        super().__init__(root, transform, pre_transform)
        self.load_split(
            self.processed_paths[0 if self._split == "train" else 1])

    @property
    def raw_file_names(self):
        return ["MPI-FAUST"]

    @property
    def processed_file_names(self):
        return ["train.npz", "test.npz"]

    def download(self):
        raise RuntimeError(
            f"FAUST requires registration; download MPI-FAUST.zip from "
            f"{self.url} and extract it under {self.raw_dir}"
        )

    def process(self):
        paths = sorted(glob.glob(osp.join(
            self.raw_dir, "MPI-FAUST", "training", "registrations",
            "tr_reg_*.ply")))
        graphs = []
        for p in paths:
            g = read_ply(p)
            n = int(g.n_node[0])
            graphs.append(g._replace(y=np.arange(n, dtype=np.int32)))
        self.save_split(graphs[:80], self.processed_paths[0])
        self.save_split(graphs[80:], self.processed_paths[1])


class PPI(InMemoryDataset):
    """reference ``ppi.py`` — 24 protein-protein interaction graphs with
    50-dim features and 121 independent labels; raw = GraphSAGE's
    ``{split}_graph.json`` (networkx node-link) + ``{split}_feats.npy`` +
    ``{split}_labels.npy`` + ``{split}_graph_id.npy``."""

    url = "https://data.dgl.ai/dataset/ppi.zip"

    def __init__(self, root, split: str = "train", transform=None,
                 pre_transform=None, pre_filter=None):
        assert split in ("train", "valid", "test")
        self._split = split
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(
            self.processed_paths[("train", "valid", "test").index(split)])

    @property
    def raw_file_names(self):
        return [f"{s}_{k}" for s in ("train", "valid", "test")
                for k in ("graph.json", "feats.npy", "labels.npy",
                          "graph_id.npy")]

    @property
    def processed_file_names(self):
        return ["train.npz", "valid.npz", "test.npz"]

    def download(self):
        path = download_url(self.url, self.raw_dir)
        extract_zip(path, self.raw_dir)

    def process(self):
        for si, split in enumerate(("train", "valid", "test")):
            with open(osp.join(self.raw_dir, f"{split}_graph.json")) as f:
                gj = json.load(f)
            x = np.load(osp.join(self.raw_dir, f"{split}_feats.npy"))
            y = np.load(osp.join(self.raw_dir, f"{split}_labels.npy"))
            gid = np.load(osp.join(self.raw_dir, f"{split}_graph_id.npy"))
            src = np.asarray([e["source"] for e in gj["links"]])
            dst = np.asarray([e["target"] for e in gj["links"]])
            graphs = []
            for g_id in np.unique(gid):
                nodes = np.nonzero(gid == g_id)[0]
                lo, n = int(nodes.min()), len(nodes)
                em = (gid[src] == g_id) & (gid[dst] == g_id)
                s = src[em] - lo
                r = dst[em] - lo
                keep = s != r  # reference removes self-loops (ppi.py:12)
                s, r = s[keep], r[keep]
                graphs.append(Graph(
                    nodes=x[nodes].astype(np.float32),
                    senders=np.concatenate([s, r]).astype(np.int32),
                    receivers=np.concatenate([r, s]).astype(np.int32),
                    n_node=np.asarray([n], np.int32),
                    n_edge=np.asarray([2 * len(s)], np.int32),
                    y=y[nodes].astype(np.float32),
                ))
            self.save_split(graphs, self.processed_paths[si])


class QM9(InMemoryDataset):
    """reference ``qm9.py`` (1.6.3 raw route) — ~130k small molecules with
    19 regression targets; raw = ``gdb9.sdf`` (multi-record molfile) +
    ``gdb9.sdf.csv`` targets + ``uncharacterized.txt`` skip list.  Molecules
    parse through :func:`io.readers.parse_sdf`; targets land in
    ``Graph.globals``."""

    raw_url = ("https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/"
               "molnet_publish/qm9.zip")

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["gdb9.sdf", "gdb9.sdf.csv"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        path = download_url(self.raw_url, self.raw_dir)
        extract_zip(path, self.raw_dir)

    def process(self):
        from ..io.readers import parse_sdf

        skip = set()
        unc = osp.join(self.raw_dir, "uncharacterized.txt")
        if osp.exists(unc):
            with open(unc) as f:
                lines = f.read().split("\n")[9:-2]
            skip = {int(ln.split()[0]) - 1 for ln in lines if ln.split()}

        with open(osp.join(self.raw_dir, "gdb9.sdf.csv")) as f:
            rows = f.read().strip().split("\n")[1:]
        targets = np.asarray(
            [[float(v) for v in ln.split(",")[1:20]] for ln in rows],
            np.float32,
        )
        # reference qm9.py:195-196 target contract: move the 3 rotational
        # constants (csv cols 0-2) to the back and convert units so e.g.
        # target 7 is U0 in eV (HAR2EV / KCALMOL2EV vectors, qm9.py:21-26)
        HAR2EV = 27.2113825435
        KCALMOL2EV = 0.04336414
        conversion = np.asarray(
            [1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV,
             HAR2EV, HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV,
             KCALMOL2EV, 1.0, 1.0, 1.0], np.float32)
        targets = np.concatenate([targets[:, 3:], targets[:, :3]], axis=1)
        targets = targets * conversion[None, :]

        with open(osp.join(self.raw_dir, "gdb9.sdf")) as f:
            records = f.read().split("$$$$\n")
        graphs = []
        for i, rec in enumerate(records):
            if not rec.strip() or i in skip or i >= len(targets):
                continue
            g = parse_sdf(rec)
            graphs.append(g._replace(globals=targets[i][None, :]))
        self.save_split(graphs, self.processed_paths[0])
