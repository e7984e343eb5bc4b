"""Molecular property benchmarks — reference ``torch_geometric/datasets/
{zinc,molecule_net,qm7}.py``.

* :class:`ZINC` keeps the benchmarking-gnns raw contract
  (``{split}.pickle`` dicts of torch tensors + ``{split}.index`` subset
  lists, ``zinc.py:59-121``): atom-type integers as node features, the
  bond-type adjacency as integer edge attributes, constrained solubility
  as the target.
* :class:`MoleculeNet` keeps the deepchem csv contracts (name → csv /
  smiles column / target columns table, ``molecule_net.py:95-118``) and
  featurizes through :func:`io.smiles.parse_smiles` (OGB feature layout;
  rdkit-free — see that module for the documented simplifications).
* :class:`QM7b` reads the ``qm7b.mat`` Coulomb matrices
  (``qm7.py:45-66``): nonzero entries become edges with the Coulomb value
  as edge attribute, 14 regression targets per molecule.
"""
from __future__ import annotations

import os.path as osp
import pickle
import re

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph
from ..io.smiles import parse_smiles


class ZINC(InMemoryDataset):
    """reference ``zinc.py`` — 250k molecular graphs (12k with
    ``subset=True``), regression on constrained solubility."""

    url = "https://www.dropbox.com/s/feo9qle74kg48gy/molecules.zip?dl=1"
    split_url = ("https://raw.githubusercontent.com/graphdeeplearning/"
                 "benchmarking-gnns/master/data/molecules/{}.index")

    def __init__(self, root, subset: bool = False, split: str = "train",
                 transform=None, pre_transform=None, pre_filter=None):
        assert split in ("train", "val", "test")
        self.subset = subset
        self._split = split
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(
            self.processed_paths[("train", "val", "test").index(split)])

    @property
    def raw_file_names(self):
        return ["train.pickle", "val.pickle", "test.pickle",
                "train.index", "val.index", "test.index"]

    @property
    def processed_dir(self):
        name = "subset" if self.subset else "full"
        return osp.join(self.root, name, "processed")

    @property
    def processed_file_names(self):
        return ["train.npz", "val.npz", "test.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)
        for split in ("train", "val", "test"):
            download_url(self.split_url.format(split), self.raw_dir)

    def process(self):
        for si, split in enumerate(("train", "val", "test")):
            with open(osp.join(self.raw_dir, f"{split}.pickle"), "rb") as f:
                mols = pickle.load(f)
            indices = range(len(mols))
            if self.subset:
                with open(osp.join(self.raw_dir, f"{split}.index")) as f:
                    indices = [int(x) for x in f.read()[:-1].split(",")]
            graphs = []
            for idx in indices:
                mol = mols[idx]
                x = np.asarray(mol["atom_type"], np.int32).reshape(-1, 1)
                y = np.asarray(
                    mol["logP_SA_cycle_normalized"], np.float32).reshape(1)
                adj = np.asarray(mol["bond_type"])
                s, r = np.nonzero(adj)
                graphs.append(Graph(
                    nodes=x,
                    senders=s.astype(np.int32),
                    receivers=r.astype(np.int32),
                    n_node=np.asarray([x.shape[0]], np.int32),
                    n_edge=np.asarray([len(s)], np.int32),
                    edges=adj[s, r].astype(np.int32),
                    y=y,
                ))
            self.save_split(graphs, self.processed_paths[si])


class MoleculeNet(InMemoryDataset):
    """reference ``molecule_net.py`` — the 12 MoleculeNet tasks with OGB
    atom/bond features.  Same csv contracts; SMILES parsed by
    :func:`io.smiles.parse_smiles` (unparseable molecules are skipped,
    like the reference skips rdkit rejects)."""

    url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/{}"

    # name -> [display_name, url_name, csv_name, smiles_idx, y_slice]
    names = {
        "esol": ["ESOL", "delaney-processed.csv", "delaney-processed",
                 -1, -2],
        "freesolv": ["FreeSolv", "SAMPL.csv", "SAMPL", 1, 2],
        "lipo": ["Lipophilicity", "Lipophilicity.csv", "Lipophilicity", 2, 1],
        "pcba": ["PCBA", "pcba.csv.gz", "pcba", -1, slice(0, 128)],
        "muv": ["MUV", "muv.csv.gz", "muv", -1, slice(0, 17)],
        "hiv": ["HIV", "HIV.csv", "HIV", 0, -1],
        "bace": ["BACE", "bace.csv", "bace", 0, 2],
        "bbbp": ["BBPB", "BBBP.csv", "BBBP", -1, -2],
        "tox21": ["Tox21", "tox21.csv.gz", "tox21", -1, slice(0, 12)],
        "toxcast": ["ToxCast", "toxcast_data.csv.gz", "toxcast_data",
                    0, slice(1, 618)],
        "sider": ["SIDER", "sider.csv.gz", "sider", 0, slice(1, 28)],
        "clintox": ["ClinTox", "clintox.csv.gz", "clintox",
                    0, slice(1, 3)],
    }

    def __init__(self, root, name: str, transform=None, pre_transform=None,
                 pre_filter=None):
        self.name = name.lower()
        assert self.name in self.names
        super().__init__(osp.join(root, self.name), transform,
                         pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return [f"{self.names[self.name][2]}.csv"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url.format(self.names[self.name][1]), self.raw_dir)

    def process(self):
        with open(self.raw_paths[0]) as f:
            lines = [ln for ln in f.read().split("\n")[1:] if ln]

        smiles_idx, y_idx = self.names[self.name][3:]
        graphs = []
        for line in lines:
            line = re.sub(r'\".*\"', "", line)  # strip quoted fields
            cells = line.split(",")
            smiles = cells[smiles_idx]
            ys = cells[y_idx] if isinstance(y_idx, slice) else [cells[y_idx]]
            y = np.asarray(
                [float(v) if len(v) > 0 else np.nan for v in ys],
                np.float32).reshape(1, -1)
            parsed = parse_smiles(smiles)
            if parsed is None:
                continue
            x, edge_index, edge_attr = parsed
            graphs.append(Graph(
                nodes=x,
                senders=edge_index[0],
                receivers=edge_index[1],
                n_node=np.asarray([x.shape[0]], np.int32),
                n_edge=np.asarray([edge_index.shape[1]], np.int32),
                edges=edge_attr,
                globals=y,
            ))
        self.save_split(graphs, self.processed_paths[0])


class QM7b(InMemoryDataset):
    """reference ``qm7.py`` — 7,211 molecules as dense Coulomb-matrix
    graphs, 14 regression targets in ``Graph.globals``.  Node features are
    the Coulomb diagonal (the reference leaves ``x`` unset; the diagonal
    0.5·Z^2.4 is the standard stand-in and keeps the Graph container
    uniform)."""

    url = "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/qm7b.mat"

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["qm7b.mat"]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        import scipy.io

        data = scipy.io.loadmat(self.raw_paths[0])
        coulomb = np.asarray(data["X"])
        target = np.asarray(data["T"], np.float32)
        graphs = []
        for i in range(target.shape[0]):
            c = coulomb[i]
            s, r = np.nonzero(c)
            n = int(max(s.max(), r.max())) + 1 if len(s) else 1
            graphs.append(Graph(
                nodes=np.diag(c)[:n].astype(np.float32).reshape(-1, 1),
                senders=s.astype(np.int32),
                receivers=r.astype(np.int32),
                n_node=np.asarray([n], np.int32),
                n_edge=np.asarray([len(s)], np.int32),
                edges=c[s, r].astype(np.float32),
                globals=target[i].reshape(1, -1),
            ))
        self.save_split(graphs, self.processed_paths[0])
