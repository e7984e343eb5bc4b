"""Graph-matching benchmarks — reference ``torch_geometric/datasets/
{willow_object_class,pascal,pascal_pf,ged_dataset}.py``.

The WILLOW / PascalVOC classes keep the reference's raw contracts and
keypoint geometry (.mat keypoints, VOC xml annotations, box-relative
256×256 rescaling).  The reference interpolates VGG16 ``relu4_2``/
``relu5_1`` features at the keypoints (``willow_object_class.py:96-160``)
— pretrained VGG weights cannot download in this no-egress image, so both
classes take a ``feature_extractor(image_hw3_uint8, pos_n2) -> (N, F)``
callable; the default emits zero features of the reference's width
(512 + 512) and records the keypoint geometry exactly.
"""
from __future__ import annotations

import glob
import os
import os.path as osp
import pickle
from itertools import chain
from xml.dom import minidom

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph

_VGG_DIM = 1024  # relu4_2 (512) + relu5_1 (512)


def _keypoint_graph(x, pos, y=None) -> Graph:
    """Keypoints as isolated nodes: ``nodes`` = (features ‖ pos)."""
    n = pos.shape[0]
    return Graph(
        nodes=np.concatenate(
            [np.asarray(x, np.float32),
             np.asarray(pos, np.float32)], axis=1),
        senders=np.zeros(0, np.int32),
        receivers=np.zeros(0, np.int32),
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([0], np.int32),
        y=y,
    )


class WILLOWObjectClass(InMemoryDataset):
    """reference ``willow_object_class.py`` — 10 keypoints per image over
    5 categories.  ``nodes`` = (features ‖ pos) with pos in the last two
    columns (image rescaled to 256×256 like the reference)."""

    url = ("http://www.di.ens.fr/willow/research/graphlearning/"
           "WILLOW-ObjectClass_dataset.zip")

    categories = ["face", "motorbike", "car", "duck", "winebottle"]

    def __init__(self, root, category: str, transform=None,
                 pre_transform=None, pre_filter=None,
                 feature_extractor=None):
        assert category.lower() in self.categories
        self.category = category.lower()
        self.feature_extractor = feature_extractor
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return [c.capitalize() for c in self.categories]

    @property
    def processed_dir(self):
        return osp.join(self.root, self.category.capitalize(), "processed")

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        from scipy.io import loadmat

        category = self.category.capitalize()
        names = sorted(
            p[:-4] for p in glob.glob(
                osp.join(self.raw_dir, category, "*.png")))
        graphs = []
        for name in names:
            pos = loadmat(name + ".mat")["pts_coord"].T.astype(np.float32)
            if pos.shape[0] != 10:  # one malformed "face" image
                continue
            from PIL import Image

            with open(name + ".png", "rb") as f:
                img = Image.open(f).convert("RGB")
            pos[:, 0] *= 256.0 / img.size[0]
            pos[:, 1] *= 256.0 / img.size[1]
            if self.feature_extractor is not None:
                img256 = np.asarray(
                    img.resize((256, 256), resample=Image.BICUBIC))
                x = self.feature_extractor(img256, pos)
            else:
                x = np.zeros((pos.shape[0], _VGG_DIM), np.float32)
            graphs.append(_keypoint_graph(x, pos))
        self.save_split(graphs, self.processed_paths[0])


class PascalVOCKeypoints(InMemoryDataset):
    """reference ``pascal.py`` — VOC2011 keypoints with Berkeley
    annotations, pre-filtered for difficult/occluded/truncated objects;
    keypoint-label ids in ``y``, box-relative 256×256 positions in the
    trailing ``nodes`` columns."""

    image_url = ("http://host.robots.ox.ac.uk/pascal/VOC/voc2011/"
                 "VOCtrainval_25-May-2011.tar")
    annotation_url = ("https://www2.eecs.berkeley.edu/Research/Projects/"
                      "CS/vision/shape/poselets/"
                      "voc2011_keypoints_Feb2012.tgz")
    split_url = ("https://github.com/Thinklab-SJTU/PCA-GM/raw/master/"
                 "data/PascalVOC/voc2011_pairs.npz")

    categories = [
        "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
        "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
        "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
    ]

    def __init__(self, root, category: str, train: bool = True,
                 transform=None, pre_transform=None, pre_filter=None,
                 feature_extractor=None):
        self.category = category.lower()
        assert self.category in self.categories
        self.feature_extractor = feature_extractor
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])

    @property
    def raw_file_names(self):
        return ["images", "annotations", "splits.npz"]

    @property
    def processed_dir(self):
        return osp.join(self.root, self.category.capitalize(), "processed")

    @property
    def processed_file_names(self):
        return ["training.npz", "test.npz"]

    def download(self):
        download_url(self.image_url, self.raw_dir)
        download_url(self.annotation_url, self.raw_dir)
        download_url(self.split_url, self.raw_dir)

    def process(self):
        splits = np.load(osp.join(self.raw_dir, "splits.npz"),
                         allow_pickle=True)
        category_idx = self.categories.index(self.category)
        train_split = list(splits["train"])[category_idx]
        test_split = list(splits["test"])[category_idx]

        image_path = osp.join(self.raw_dir, "images", "JPEGImages")
        info_path = osp.join(self.raw_dir, "images", "Annotations")
        annotation_path = osp.join(self.raw_dir, "annotations")
        labels = {}

        train_graphs, test_graphs = [], []
        for i, name in enumerate(chain(train_split, test_split)):
            filename = "_".join(name.split("/")[1].split("_")[:-1])
            obj_idx = int(name.split("_")[-1].split(".")[0]) - 1

            dom = minidom.parse(osp.join(info_path, f"{filename}.xml"))
            obj = dom.getElementsByTagName("object")[obj_idx]

            def field(tag, default=None):
                els = obj.getElementsByTagName(tag)
                return default if not els else els[0].firstChild.data

            if (bool(int(field("truncated", "0")))
                    or bool(int(field("occluded", "0")))
                    or bool(int(field("difficult", "0")))):
                continue
            if self.category == "person" and int(filename[:4]) > 2008:
                continue

            box = [float(field(t)) for t in ("xmin", "ymin", "xmax",
                                             "ymax")]

            kdom = minidom.parse(osp.join(annotation_path, name))
            poss, ys = [], []
            for kp in kdom.getElementsByTagName("keypoint"):
                label = kp.attributes["name"].value
                labels.setdefault(label, len(labels))
                ys.append(labels[label])
                poss.append([float(kp.attributes["x"].value),
                             float(kp.attributes["y"].value)])
            if not poss:
                continue
            pos = np.asarray(poss, np.float32)
            y = np.asarray(ys, np.int32)

            # widen the box so all keypoints fall inside (pascal.py:189)
            box = (min(np.floor(pos[:, 0].min()), box[0]) - 16,
                   min(np.floor(pos[:, 1].min()), box[1]) - 16,
                   max(np.ceil(pos[:, 0].max()), box[2]) + 16,
                   max(np.ceil(pos[:, 1].max()), box[3]) + 16)
            pos[:, 0] = (pos[:, 0] - box[0]) * 256.0 / (box[2] - box[0])
            pos[:, 1] = (pos[:, 1] - box[1]) * 256.0 / (box[3] - box[1])

            if self.feature_extractor is not None:
                from PIL import Image

                with open(osp.join(image_path, f"{filename}.jpg"),
                          "rb") as f:
                    img = Image.open(f).convert("RGB").crop(box)
                img = np.asarray(
                    img.resize((256, 256), resample=Image.BICUBIC))
                x = self.feature_extractor(img, pos)
            else:
                x = np.zeros((pos.shape[0], _VGG_DIM), np.float32)

            g = _keypoint_graph(x, pos, y=y)
            (train_graphs if i < len(train_split)
             else test_graphs).append(g)

        self.save_split(train_graphs, self.processed_paths[0])
        self.save_split(test_graphs, self.processed_paths[1])


class PascalPF(InMemoryDataset):
    """reference ``pascal_pf.py`` — Proposal-Flow keypoint clouds
    (unit-sphere normalized) + the per-category evaluation ``pairs``
    list; valid-keypoint indices in ``y``."""

    url = ("https://www.di.ens.fr/willow/research/proposalflow/dataset/"
           "PF-dataset-PASCAL.zip")

    categories = [
        "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
        "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
        "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
    ]

    def __init__(self, root, category: str, transform=None,
                 pre_transform=None, pre_filter=None):
        self.category = category.lower()
        assert self.category in self.categories
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])
        z = np.load(self.processed_paths[1])
        self.pairs = [tuple(p) for p in z["pairs"]]

    @property
    def raw_file_names(self):
        return ["Annotations", "parsePascalVOC.mat"]

    @property
    def processed_file_names(self):
        return [f"{self.category}.npz", f"{self.category}_pairs.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        from scipy.io import loadmat

        paths = glob.glob(osp.join(self.raw_dir, "Annotations",
                                   self.category, "*.mat"))
        names, graphs = [], []
        for filename in sorted(paths):
            name = filename.split(os.sep)[-1].split(".")[0]
            pos = loadmat(filename)["kps"].astype(np.float32)
            mask = ~np.isnan(pos[:, 0])
            y = np.nonzero(mask)[0].astype(np.int32)
            pos = pos[mask]
            pos = pos - pos.mean(axis=0, keepdims=True)
            pos = pos / np.linalg.norm(pos, axis=1).max()
            names.append(name)
            graphs.append(_keypoint_graph(
                np.zeros((pos.shape[0], 0), np.float32), pos, y=y))

        def cellstr(c):
            while isinstance(c, np.ndarray):
                c = c[0]
            return str(c)

        mat = loadmat(osp.join(self.raw_dir, "parsePascalVOC.mat"))
        pairs = mat["PascalVOC"]["pair"][0, 0][
            0, self.categories.index(self.category)]
        pairs = np.asarray(
            [(names.index(cellstr(x[0])), names.index(cellstr(x[1])))
             for x in pairs] if len(pairs) else np.zeros((0, 2)),
            np.int64)

        self.save_split(graphs, self.processed_paths[0])
        np.savez(self.processed_paths[1], pairs=pairs)


class GEDDataset(InMemoryDataset):
    """reference ``ged_dataset.py`` — graph-edit-distance corpora
    (AIDS700nef / LINUX / ALKANE / IMDBMulti): gexf graphs + the pairwise
    ``ged`` / ``norm_ged`` matrices, AIDS one-hot atom types; each
    graph's global id in ``globals``."""

    url = "https://drive.google.com/uc?export=download&id={}"

    datasets = {"AIDS700nef": {}, "LINUX": {}, "ALKANE": {},
                "IMDBMulti": {}}

    types = [
        "O", "S", "C", "N", "Cl", "Br", "B", "Si", "Hg", "I", "Bi", "P",
        "F", "Cu", "Ho", "Pd", "Ru", "Pt", "Sn", "Li", "Ga", "Tb", "As",
        "Co", "Pb", "Sb", "Se", "Ni", "Te",
    ]

    def __init__(self, root, name: str, train: bool = True,
                 transform=None, pre_transform=None, pre_filter=None):
        assert name in self.datasets
        self.name = name
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])
        z = np.load(
            osp.join(self.processed_dir, f"{self.name}_ged.npz"))
        self.ged, self.norm_ged = z["ged"], z["norm_ged"]

    @property
    def raw_file_names(self):
        return [osp.join(self.name, s) for s in ("train", "test")]

    @property
    def processed_file_names(self):
        return [f"{self.name}_{s}.npz" for s in ("training", "test")]

    def download(self):
        raise RuntimeError(
            f"GEDDataset raw archives are hosted on Google Drive (see the "
            f"reference's ged_dataset.py); extract train/test gexf dirs + "
            f"ged.pickle under {osp.join(self.raw_dir, self.name)}")

    def process(self):
        import networkx as nx

        ids, Ns = [], []
        for r_path, p_path in zip(self.raw_paths, self.processed_paths):
            names = glob.glob(osp.join(r_path, "*.gexf"))
            ids.append(sorted(int(n.split(os.sep)[-1][:-5])
                              for n in names))
            graphs = []
            for i, idx in enumerate(ids[-1]):
                gid = i if len(ids) == 1 else i + len(ids[0])
                G = nx.read_gexf(osp.join(r_path, f"{idx}.gexf"))
                mapping = {name: j for j, name in enumerate(G.nodes())}
                G = nx.relabel_nodes(G, mapping)
                n = G.number_of_nodes()
                Ns.append(n)
                edges = np.asarray(list(G.edges), np.int64).reshape(-1, 2)
                both = np.concatenate([edges, edges[:, ::-1]], axis=0)
                key = np.unique(both[:, 0] * max(n, 1) + both[:, 1])
                s, r = (key // max(n, 1)).astype(np.int32), \
                    (key % max(n, 1)).astype(np.int32)
                if self.name == "AIDS700nef":
                    x = np.zeros((n, len(self.types)), np.float32)
                    for node, info in G.nodes(data=True):
                        x[int(node), self.types.index(info["type"])] = 1.0
                else:
                    x = np.zeros((n, 1), np.float32)
                graphs.append(Graph(
                    nodes=x, senders=s, receivers=r,
                    n_node=np.asarray([n], np.int32),
                    n_edge=np.asarray([len(s)], np.int32),
                    globals=np.asarray([[gid]], np.int32),
                ))
            self.save_split(graphs, p_path)

        assoc = {idx: i for i, idx in enumerate(ids[0])}
        assoc.update(
            {idx: i + len(ids[0]) for i, idx in enumerate(ids[1])})
        mat = np.full((len(assoc), len(assoc)), np.inf, np.float32)
        with open(osp.join(self.raw_dir, self.name, "ged.pickle"),
                  "rb") as f:
            obj = pickle.load(f)
        for (a, b), g in obj.items():
            mat[assoc[a], assoc[b]] = mat[assoc[b], assoc[a]] = g
        N = np.asarray(Ns, np.float32)
        norm = mat / (0.5 * (N[:, None] + N[None, :]))
        np.savez(osp.join(self.processed_dir, f"{self.name}_ged.npz"),
                 ged=mat, norm_ged=norm)
