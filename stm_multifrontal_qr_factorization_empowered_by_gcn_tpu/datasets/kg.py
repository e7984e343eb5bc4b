"""Knowledge-graph / relational / heterogeneous datasets — reference
``torch_geometric/datasets/{entities,word_net,dbp15k,aminer,snap_dataset}.py``.

* :class:`Entities` keeps the DGL raw contract
  (``{name}_stripped.nt.gz`` N-Triples + three tsv label tables,
  ``entities.py:60-160``) but parses N-Triples directly (rdflib is not in
  this image; the stripped dumps are line-oriented ``<s> <p> <o> .``
  triples, for which a direct parse is exact).  Relations are sorted by
  descending frequency and doubled (2·rel forward / 2·rel+1 inverse),
  matching the reference's edge construction.
* :class:`WordNet18` reads the pickled networkx graph contract
  (``word_net.py:36-53``) without ``nx.read_gpickle`` (removed in
  networkx 3).
* :class:`DBP15K` keeps the pair-directory contract
  (``dbp15k.py:44-120``).  Deviation: per-node word-embedding *sums*
  (N, 300) instead of the reference's padded sequences — the reference's
  own consumers reduce over the sequence axis first.
* :class:`AMiner` exposes the reference's heterogeneous dicts
  (``edge_index_dict`` / ``y_dict`` / ``y_index_dict`` /
  ``num_nodes_dict``, ``aminer.py:100-125``).
* :class:`SNAPDataset` covers the reference's nine SNAP graphs with the
  three readers (ego-/soc-/wiki-, ``snap_dataset.py:24-143``).
"""
from __future__ import annotations

import glob
import gzip
import os
import os.path as osp
import pickle
from collections import Counter

import numpy as np

from ..data.dataset import Dataset, InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph


def _coalesce(s, r, n):
    key = np.unique(np.asarray(s, np.int64) * n + np.asarray(r, np.int64))
    return (key // n).astype(np.int32), (key % n).astype(np.int32)


# ---------------------------------------------------------------------------
# Entities (AIFB / MUTAG / BGS / AM)
# ---------------------------------------------------------------------------

def _parse_nt_line(line: str):
    """One N-Triples line → (subject, predicate, object) strings."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    # subject and predicate are IRIs or blank nodes (no spaces);
    # object is the remainder up to the trailing ' .'
    a = line.index(" ")
    b = line.index(" ", a + 1)
    obj = line[b + 1:].rstrip()
    if obj.endswith("."):
        obj = obj[:-1].rstrip()
    return line[:a], line[a + 1:b], obj


class Entities(InMemoryDataset):
    """reference ``entities.py`` — RGCN entity-classification benchmarks.
    ``graph.edges`` holds the doubled relation types; node splits live in
    ``train_idx``/``train_y``/``test_idx``/``test_y``."""

    url = "https://data.dgl.ai/dataset/{}.tgz"

    _headers = {
        "am": ("label_cateogory", "proxy"),
        "aifb": ("label_affiliation", "person"),
        "mutag": ("label_mutagenic", "bond"),
        "bgs": ("label_lithogenesis", "rock"),
    }

    def __init__(self, root, name: str, transform=None, pre_transform=None):
        assert name in ("AIFB", "AM", "MUTAG", "BGS")
        self.name = name.lower()
        super().__init__(osp.join(root, self.name), transform, pre_transform)
        self.load_split(self.processed_paths[0])
        z = np.load(self.processed_paths[1])
        self.train_idx, self.train_y = z["train_idx"], z["train_y"]
        self.test_idx, self.test_y = z["test_idx"], z["test_y"]
        self.num_relations = int(z["num_relations"])

    @property
    def raw_file_names(self):
        return [f"{self.name}_stripped.nt.gz", "completeDataset.tsv",
                "trainingSet.tsv", "testSet.tsv"]

    @property
    def processed_file_names(self):
        return ["data.npz", "splits.npz"]

    def download(self):
        download_url(self.url.format(self.name), self.raw_dir)

    def process(self):
        triples = []
        with gzip.open(self.raw_paths[0], "rt", errors="replace") as f:
            for line in f:
                t = _parse_nt_line(line)
                if t is not None:
                    triples.append(t)

        freq = Counter(p for _, p, _ in triples)
        relations = sorted(freq, key=lambda rel: -freq[rel])
        rel_dict = {rel: i for i, rel in enumerate(relations)}
        nodes = sorted({s for s, _, _ in triples}
                       | {o for _, _, o in triples})
        node_dict = {node: i for i, node in enumerate(nodes)}

        edges = []
        for s, p, o in triples:
            src, dst, rel = node_dict[s], node_dict[o], rel_dict[p]
            edges.append((src, dst, 2 * rel))
            edges.append((dst, src, 2 * rel + 1))
        edges.sort()
        edges = np.asarray(edges, np.int64)
        n = len(nodes)

        label_h, node_h = self._headers[self.name]

        def read_split(path):
            with open(path) as f:
                rows = [r.split("\t") for r in f.read().strip().split("\n")]
            header = rows[0]
            li, ni = header.index(label_h), header.index(node_h)
            return [(r[ni], r[li]) for r in rows[1:]]

        labels = sorted({lab for _, lab in read_split(self.raw_paths[1])})
        lab_dict = {lab: i for i, lab in enumerate(labels)}

        def strip_iri(x):
            return x[1:-1] if x.startswith("<") and x.endswith(">") else x

        iri_node_dict = {strip_iri(k): v for k, v in node_dict.items()}

        def to_idx(pairs):
            idx = [iri_node_dict.get(nd, node_dict.get(f"<{nd}>",
                                                       node_dict.get(nd)))
                   for nd, _ in pairs]
            return (np.asarray(idx, np.int64),
                    np.asarray([lab_dict[lab] for _, lab in pairs],
                               np.int64))

        train_idx, train_y = to_idx(read_split(self.raw_paths[2]))
        test_idx, test_y = to_idx(read_split(self.raw_paths[3]))

        g = Graph(
            nodes=np.zeros((n, 1), np.float32),
            senders=edges[:, 0].astype(np.int32),
            receivers=edges[:, 1].astype(np.int32),
            n_node=np.asarray([n], np.int32),
            n_edge=np.asarray([len(edges)], np.int32),
            edges=edges[:, 2].astype(np.int32),
        )
        self.save_split([g], self.processed_paths[0])
        np.savez(self.processed_paths[1], train_idx=train_idx,
                 train_y=train_y, test_idx=test_idx, test_y=test_y,
                 num_relations=2 * len(relations))


class WordNet18(InMemoryDataset):
    """reference ``word_net.py`` — 41k entities / 18 relations / 141k fact
    triples; relation types in ``graph.edges``."""

    url = "https://www.dropbox.com/s/qdwi3wh18kcumqd/WN18.gpickle?dl=1"

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["WN18.gpickle"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        with open(self.raw_paths[0], "rb") as f:
            G = pickle.load(f)
        rows = []
        for v, w, d in G.edges(data=True):
            lab = d["e_label"]
            rows.append((int(v), int(w),
                         int(lab.item() if hasattr(lab, "item") else lab)))
        rows = np.asarray(rows, np.int64)
        n = G.number_of_nodes()
        g = Graph(
            nodes=np.zeros((n, 1), np.float32),
            senders=rows[:, 0].astype(np.int32),
            receivers=rows[:, 1].astype(np.int32),
            n_node=np.asarray([n], np.int32),
            n_edge=np.asarray([len(rows)], np.int32),
            edges=rows[:, 2].astype(np.int32),
        )
        self.save_split([g], self.processed_paths[0])


class DBP15K(Dataset):
    """reference ``dbp15k.py`` — cross-lingual KG-alignment pairs.  Loads
    both graphs plus train/test alignment index pairs; per-node features
    are glove-300 word-embedding sums (see module docstring)."""

    pairs = ("en_zh", "en_fr", "en_ja", "zh_en", "fr_en", "ja_en")

    def __init__(self, root, pair: str, transform=None, pre_transform=None):
        assert pair in self.pairs
        self.pair = pair
        super().__init__(root, transform, pre_transform)
        z = np.load(self.processed_paths[0])
        self.x1, self.edge_index1, self.rel1 = z["x1"], z["ei1"], z["rel1"]
        self.x2, self.edge_index2, self.rel2 = z["x2"], z["ei2"], z["rel2"]
        self.train_y, self.test_y = z["train_y"], z["test_y"]

    @property
    def raw_file_names(self):
        return list(self.pairs) + ["sub.glove.300d"]

    @property
    def processed_file_names(self):
        return [f"{self.pair}.npz"]

    def download(self):
        raise RuntimeError(
            "DBP15K is hosted on Google Drive (see the reference's "
            f"dbp15k.py); extract the DBP15K folder under {self.raw_dir}")

    def _graph(self, triple_path, feat_path, embs, unk):
        tri = np.loadtxt(triple_path, dtype=np.int64, ndmin=2)
        x_dict = {}
        with open(feat_path) as f:
            for line in f:
                info = line.strip().split("\t")
                words = (info[1] if len(info) == 2 else "**UNK**").lower()
                vecs = [embs.get(w, unk) for w in words.split()]
                x_dict[int(info[0])] = np.sum(vecs, axis=0)
        ids = np.asarray(sorted(x_dict), np.int64)
        assoc = np.full(int(ids.max()) + 1, -1, np.int64)
        assoc[ids] = np.arange(len(ids))
        ei = np.stack([assoc[tri[:, 0]], assoc[tri[:, 2]]])
        x = np.stack([x_dict[i] for i in ids]).astype(np.float32)
        return x, ei.astype(np.int32), tri[:, 1].astype(np.int32), assoc

    def process(self):
        embs, unk = {}, None
        with open(osp.join(self.raw_dir, "sub.glove.300d")) as f:
            for line in f:
                info = line.strip().split(" ")
                if len(info) > 300:
                    embs[info[0]] = np.asarray(info[1:], np.float32)
                else:
                    unk = np.asarray(info, np.float32)
        if unk is None:
            unk = np.zeros(300, np.float32)
        embs["**UNK**"] = unk

        d = osp.join(self.raw_dir, self.pair)
        x1, ei1, rel1, a1 = self._graph(
            osp.join(d, "triples_1"), osp.join(d, "id_features_1"),
            embs, unk)
        x2, ei2, rel2, a2 = self._graph(
            osp.join(d, "triples_2"), osp.join(d, "id_features_2"),
            embs, unk)

        def read_pairs(path):
            rows = np.loadtxt(path, dtype=np.int64, ndmin=2)
            mask = rows[:, 2].astype(bool) if rows.shape[1] > 2 \
                else np.ones(len(rows), bool)
            return np.stack([a1[rows[mask, 0]], a2[rows[mask, 1]]])

        np.savez(
            self.processed_paths[0], x1=x1, ei1=ei1, rel1=rel1,
            x2=x2, ei2=ei2, rel2=rel2,
            train_y=read_pairs(osp.join(d, "train.examples.20")),
            test_y=read_pairs(osp.join(d, "test.examples.1000")))

    def len(self):
        return 1

    def get(self, idx):
        return self


class AMiner(Dataset):
    """reference ``aminer.py`` — heterogeneous paper/author/venue network
    for metapath2vec; exposes the reference's dict surface."""

    url = "https://www.dropbox.com/s/1bnz8r7mofx0osf/net_aminer.zip?dl=1"
    y_url = "https://www.dropbox.com/s/nkocx16rpl4ydde/label.zip?dl=1"

    def __init__(self, root, transform=None, pre_transform=None):
        super().__init__(root, transform, pre_transform)
        z = np.load(self.processed_paths[0])
        pa, pv = z["paper_author"], z["paper_venue"]
        self.edge_index_dict = {
            ("paper", "written by", "author"): pa,
            ("author", "wrote", "paper"): pa[::-1],
            ("paper", "published in", "venue"): pv,
            ("venue", "published", "paper"): pv[::-1],
        }
        self.y_dict = {"author": z["author_y"], "venue": z["venue_y"]}
        self.y_index_dict = {"author": z["author_y_index"],
                             "venue": z["venue_y_index"]}
        self.num_nodes_dict = {
            "paper": int(z["num_paper"]), "author": int(z["num_author"]),
            "venue": int(z["num_venue"])}

    @property
    def raw_file_names(self):
        return ["id_author.txt", "id_conf.txt", "paper.txt",
                "paper_author.txt", "paper_conf.txt", "label"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)
        download_url(self.y_url, self.raw_dir)

    def process(self):
        import pandas as pd

        author = pd.read_csv(osp.join(self.raw_dir, "id_author.txt"),
                             sep="\t", names=["idx", "name"], index_col=1)
        df = pd.read_csv(
            osp.join(self.raw_dir, "label",
                     "googlescholar.8area.author.label.txt"),
            sep=" ", names=["name", "y"]).join(author, on="name")
        author_y = df["y"].values - 1
        author_y_index = df["idx"].values

        venue = pd.read_csv(osp.join(self.raw_dir, "id_conf.txt"),
                            sep="\t", names=["idx", "name"], index_col=1)
        df = pd.read_csv(
            osp.join(self.raw_dir, "label",
                     "googlescholar.8area.venue.label.txt"),
            sep=" ", names=["name", "y"]).join(venue, on="name")
        venue_y = df["y"].values - 1
        venue_y_index = df["idx"].values

        def read_pairs(name):
            rows = np.loadtxt(osp.join(self.raw_dir, name),
                              dtype=np.int64, ndmin=2)
            m = int(rows[:, 0].max()) + 1
            nn = int(rows[:, 1].max()) + 1
            s, r = _coalesce(rows[:, 0], rows[:, 1], max(m, nn))
            return np.stack([s, r]).astype(np.int64), m

        paper_author, m1 = read_pairs("paper_author.txt")
        paper_venue, m2 = read_pairs("paper_conf.txt")

        np.savez(self.processed_paths[0], paper_author=paper_author,
                 paper_venue=paper_venue, author_y=author_y,
                 author_y_index=author_y_index, venue_y=venue_y,
                 venue_y_index=venue_y_index,
                 num_paper=max(m1, m2), num_author=author.shape[0],
                 num_venue=venue.shape[0])

    def len(self):
        return 1

    def get(self, idx):
        return self


class SNAPDataset(InMemoryDataset):
    """reference ``snap_dataset.py`` — nine SNAP graphs via the ego-/soc-/
    wiki- readers.  Ego networks add the fully-connected ego node and the
    reordered global feature columns like ``read_ego``
    (``snap_dataset.py:24-113``)."""

    url = "https://snap.stanford.edu/data"

    available_datasets = {
        "ego-facebook": ["facebook.tar.gz"],
        "ego-gplus": ["gplus.tar.gz"],
        "ego-twitter": ["twitter.tar.gz"],
        "soc-epinions1": ["soc-Epinions1.txt.gz"],
        "soc-livejournal1": ["soc-LiveJournal1.txt.gz"],
        "soc-pokec": ["soc-pokec-relationships.txt.gz"],
        "soc-slashdot0811": ["soc-Slashdot0811.txt.gz"],
        "soc-slashdot0922": ["soc-Slashdot0902.txt.gz"],
        "wiki-vote": ["wiki-Vote.txt.gz"],
    }

    def __init__(self, root, name: str, transform=None, pre_transform=None,
                 pre_filter=None):
        self.name = name.lower()
        assert self.name in self.available_datasets
        super().__init__(osp.join(root, self.name), transform,
                         pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return self.available_datasets[self.name]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        for name in self.available_datasets[self.name]:
            download_url(f"{self.url}/{name}", self.raw_dir)

    def _read_ego(self, files):
        files = [f for f in files if f.split(".")[-1] in
                 ("circles", "edges", "egofeat", "feat", "featnames")]
        files.sort()
        all_featnames = set()
        for i in range(4, len(files), 5):
            with open(files[i]) as f:
                for ln in f.read().split("\n")[:-1]:
                    all_featnames.add(" ".join(ln.split(" ")[1:]))
        featname_idx = {k: i for i, k in enumerate(sorted(all_featnames))}

        graphs = []
        for i in range(0, len(files), 5):
            (_circles, edges_f, egofeat_f, feat_f, featnames_f) = \
                files[i:i + 5]
            x = None
            if "gplus" not in self.name:
                x_ego = np.loadtxt(egofeat_f, dtype=np.float32, ndmin=2)
                rows = np.loadtxt(feat_f, dtype=str, ndmin=2)
                x_local = rows[:, 1:].astype(np.float32)
                with open(featnames_f) as f:
                    featnames = [" ".join(ln.split(" ")[1:])
                                 for ln in f.read().split("\n")[:-1]]
                cols = [featname_idx[fn] for fn in featnames]
                x = np.zeros((len(rows) + 1, len(featname_idx)), np.float32)
                x[:-1, cols] = x_local
                x[-1, cols] = x_ego[0]
                ids = rows[:, 0]
            else:
                ids = np.loadtxt(feat_f, dtype=str, usecols=[0], ndmin=1)
            assoc = {j: k for k, j in enumerate(ids)}
            try:
                erows = np.loadtxt(edges_f, dtype=str, ndmin=2)
            except Exception:
                continue
            s = np.asarray([assoc[v] for v in erows[:, 0]], np.int64)
            r = np.asarray([assoc[v] for v in erows[:, 1]], np.int64)
            n = (x.shape[0] if x is not None
                 else int(max(s.max(), r.max())) + 2)
            ego = n - 1
            s = np.concatenate([s, np.full(ego, ego), np.arange(ego)])
            r = np.concatenate([r, np.arange(ego), np.full(ego, ego)])
            s, r = _coalesce(s, r, n)
            graphs.append(Graph(
                nodes=x if x is not None
                else np.zeros((n, 1), np.float32),
                senders=s, receivers=r,
                n_node=np.asarray([n], np.int32),
                n_edge=np.asarray([len(s)], np.int32),
            ))
        return graphs

    def _read_edges(self, path, relabel: bool):
        skip = 0 if "pokec" in self.name else 4
        ei = np.loadtxt(path, dtype=np.int64, skiprows=skip, ndmin=2)
        if relabel:
            ids, ei = np.unique(ei, return_inverse=True)
            ei = ei.reshape(-1, 2)
        n = int(ei.max()) + 1
        s, r = _coalesce(ei[:, 0], ei[:, 1], n)
        return [Graph(
            nodes=np.zeros((n, 1), np.float32),
            senders=s, receivers=r,
            n_node=np.asarray([n], np.int32),
            n_edge=np.asarray([len(s)], np.int32),
        )]

    def process(self):
        raw_dir = self.raw_dir
        inner = os.listdir(raw_dir)
        if len(inner) == 1 and osp.isdir(osp.join(raw_dir, inner[0])):
            raw_dir = osp.join(raw_dir, inner[0])
        files = sorted(glob.glob(osp.join(raw_dir, "*")))
        if self.name.startswith("ego-"):
            graphs = self._read_ego(files)
        elif self.name.startswith("soc-"):
            graphs = self._read_edges(files[0], relabel=False)
        else:  # wiki-
            graphs = self._read_edges(files[0], relabel=True)
        self.save_split(graphs, self.processed_paths[0])
