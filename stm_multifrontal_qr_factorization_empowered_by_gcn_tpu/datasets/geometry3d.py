"""3D mesh / point-cloud datasets — reference ``torch_geometric/datasets/
{shapenet,s3dis,coma,dynamic_faust,shrec2016,tosca,pcpnet_dataset,geometry,
particle}.py``.

Package conventions (matching :class:`ModelNet` / :class:`FAUST` from
``collections.py``): mesh faces become bidirectional ring edges through
the package's mesh readers (the reference keeps a ``face`` tensor
instead), positions live in the leading ``Graph.nodes`` columns, and
extra per-point channels are concatenated after them."""
from __future__ import annotations

import glob
import json
import os
import os.path as osp
from itertools import product
from typing import NamedTuple, Optional

import numpy as np

from ..data.dataset import Dataset, InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph
from ..io.readers import read_off, read_ply


def _point_cloud(nodes, y=None, globals_=None) -> Graph:
    n = nodes.shape[0]
    return Graph(
        nodes=np.asarray(nodes, np.float32),
        senders=np.zeros(0, np.int32),
        receivers=np.zeros(0, np.int32),
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([0], np.int32),
        y=y, globals=globals_,
    )


def _mesh(pos, faces, y=None, globals_=None) -> Graph:
    s, r = [], []
    for face in faces:
        for i in range(len(face)):
            a, b = int(face[i]), int(face[(i + 1) % len(face)])
            s += [a, b]
            r += [b, a]
    return Graph(
        nodes=np.asarray(pos, np.float32),
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32),
        n_node=np.asarray([len(pos)], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
        y=y, globals=globals_,
    )


class ShapeNet(InMemoryDataset):
    """reference ``shapenet.py`` — 17k point clouds over 16 categories,
    50 part labels.  ``nodes`` = (pos ‖ normals) → (N, 6) (set
    ``include_normals=False`` to slice them off); per-point part labels in
    ``y``; the category index in ``globals``.  ``y_mask`` maps categories
    to their valid part labels like the reference."""

    url = ("https://shapenet.cs.stanford.edu/media/"
           "shapenetcore_partanno_segmentation_benchmark_v0_normal.zip")

    category_ids = {
        "Airplane": "02691156", "Bag": "02773838", "Cap": "02954340",
        "Car": "02958343", "Chair": "03001627", "Earphone": "03261776",
        "Guitar": "03467517", "Knife": "03624134", "Lamp": "03636649",
        "Laptop": "03642806", "Motorbike": "03790512", "Mug": "03797390",
        "Pistol": "03948459", "Rocket": "04099429",
        "Skateboard": "04225987", "Table": "04379243",
    }

    seg_classes = {
        "Airplane": [0, 1, 2, 3], "Bag": [4, 5], "Cap": [6, 7],
        "Car": [8, 9, 10, 11], "Chair": [12, 13, 14, 15],
        "Earphone": [16, 17, 18], "Guitar": [19, 20, 21],
        "Knife": [22, 23], "Lamp": [24, 25, 26, 27], "Laptop": [28, 29],
        "Motorbike": [30, 31, 32, 33, 34, 35], "Mug": [36, 37],
        "Pistol": [38, 39, 40], "Rocket": [41, 42, 43],
        "Skateboard": [44, 45, 46], "Table": [47, 48, 49],
    }

    def __init__(self, root, categories=None, include_normals: bool = True,
                 split: str = "trainval", transform=None,
                 pre_transform=None, pre_filter=None):
        if categories is None:
            categories = list(self.category_ids)
        if isinstance(categories, str):
            categories = [categories]
        assert all(c in self.category_ids for c in categories)
        assert split in ("train", "val", "test", "trainval")
        self.categories = categories
        self.include_normals = include_normals
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[
            ("train", "val", "test", "trainval").index(split)])
        if not include_normals:
            self._graphs = [g._replace(nodes=g.nodes[:, :3])
                            for g in self._graphs]
        self.y_mask = np.zeros((len(self.seg_classes), 50), bool)
        for i, labels in enumerate(self.seg_classes.values()):
            self.y_mask[i, labels] = True

    @property
    def num_classes(self):
        return self.y_mask.shape[-1]

    @property
    def raw_file_names(self):
        # only the selected categories' directories are required locally
        # (the reference requires the full extraction)
        return [self.category_ids[c] for c in self.categories] \
            + ["train_test_split"]

    @property
    def processed_file_names(self):
        cats = "_".join(c[:3].lower() for c in self.categories)
        return [f"{cats}_{s}.npz"
                for s in ("train", "val", "test", "trainval")]

    def download(self):
        download_url(self.url, self.raw_dir)

    def _load_files(self, filenames):
        wanted = {self.category_ids[c]: i
                  for i, c in enumerate(self.categories)}
        graphs = []
        for name in filenames:
            cat = name.split("/")[0]
            if cat not in wanted:
                continue
            rows = np.loadtxt(
                osp.join(self.raw_dir, *name.split("/")), ndmin=2)
            graphs.append(_point_cloud(
                rows[:, :6],
                y=rows[:, -1].astype(np.int32),
                globals_=np.asarray([[wanted[cat]]], np.int32)))
        return graphs

    def process(self):
        trainval = []
        for i, split in enumerate(("train", "val", "test")):
            path = osp.join(self.raw_dir, "train_test_split",
                            f"shuffled_{split}_file_list.json")
            with open(path) as f:
                filenames = ["/".join(n.split("/")[1:]) + ".txt"
                             for n in json.load(f)]
            graphs = self._load_files(filenames)
            if split in ("train", "val"):
                trainval += graphs
            self.save_split(graphs, self.processed_paths[i])
        self.save_split(trainval, self.processed_paths[3])


class S3DIS(InMemoryDataset):
    """reference ``s3dis.py`` — pre-chunked indoor rooms (4096 points,
    9 channels: xyz ‖ rgb ‖ normalized-xyz), 13 semantic classes;
    ``test_area`` selects the held-out building area."""

    url = ("https://shapenet.cs.stanford.edu/media/"
           "indoor3d_sem_seg_hdf5_data.zip")

    def __init__(self, root, test_area: int = 6, train: bool = True,
                 transform=None, pre_transform=None, pre_filter=None):
        assert 1 <= test_area <= 6
        self.test_area = test_area
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])

    @property
    def raw_file_names(self):
        return ["all_files.txt", "room_filelist.txt"]

    @property
    def processed_file_names(self):
        return [f"{s}_{self.test_area}.npz" for s in ("train", "test")]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        import h5py

        with open(self.raw_paths[0]) as f:
            filenames = [x.split("/")[-1]
                         for x in f.read().split("\n")[:-1]]
        with open(self.raw_paths[1]) as f:
            rooms = f.read().split("\n")[:-1]

        xs, ys = [], []
        for filename in filenames:
            with h5py.File(osp.join(self.raw_dir, filename), "r") as f:
                xs.append(np.asarray(f["data"], np.float32))
                ys.append(np.asarray(f["label"], np.int32))
        xs = np.concatenate(xs, axis=0)
        ys = np.concatenate(ys, axis=0)

        test_area = f"Area_{self.test_area}"
        train_graphs, test_graphs = [], []
        for i in range(xs.shape[0]):
            g = _point_cloud(xs[i], y=ys[i])
            (test_graphs if test_area in rooms[i]
             else train_graphs).append(g)
        self.save_split(train_graphs, self.processed_paths[0])
        self.save_split(test_graphs, self.processed_paths[1])


class CoMA(InMemoryDataset):
    """reference ``coma.py`` — 20k face meshes over 12 extreme
    expressions (the expression index is ``y``); registration-gated raw
    zip like :class:`FAUST`."""

    url = "https://coma.is.tue.mpg.de/"

    categories = [
        "bareteeth", "cheeks_in", "eyebrow", "high_smile", "lips_back",
        "lips_up", "mouth_down", "mouth_extreme", "mouth_middle",
        "mouth_open", "mouth_side", "mouth_up",
    ]

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None, pre_filter=None):
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])

    @property
    def raw_file_names(self):
        return ["COMA_data"]

    @property
    def processed_file_names(self):
        return ["training.npz", "test.npz"]

    def download(self):
        raise RuntimeError(
            f"CoMA requires registration; download COMA_data.zip from "
            f"{self.url} and extract it under {self.raw_dir}")

    def process(self):
        folders = sorted(glob.glob(osp.join(self.raw_dir, "**",
                                            "FaceTalk_*"), recursive=True))
        train_graphs, test_graphs = [], []
        for folder in folders:
            for ci, category in enumerate(self.categories):
                files = sorted(glob.glob(osp.join(folder, category,
                                                  "*.ply")))
                for j, fpath in enumerate(files):
                    g = read_ply(fpath)._replace(
                        y=np.asarray([ci], np.int32))
                    ((train_graphs if (j % 100) < 90 else test_graphs)
                     .append(g))
        self.save_split(train_graphs, self.processed_paths[0])
        self.save_split(test_graphs, self.processed_paths[1])


class DynamicFAUST(InMemoryDataset):
    """reference ``dynamic_faust.py`` — registered human motion sequences
    from two hdf5 archives.  Deviation from the reference's
    ``pos (T, N, 3)`` tensor: each *frame* is one graph (sequences have
    ragged lengths, and the collated npz container needs a fixed node
    width); ``globals`` = ``[sequence_index, t, T]`` so sequences
    reassemble exactly.  The shared template faces become edges."""

    url = "http://dfaust.is.tue.mpg.de/"

    subjects = ["50002", "50004", "50007", "50009", "50020", "50021",
                "50022", "50025", "50026", "50027"]
    categories = [
        "chicken_wings", "hips", "jiggle_on_toes", "jumping_jacks",
        "knees", "light_hopping_loose", "light_hopping_stiff",
        "one_leg_jump", "one_leg_loose", "personal_move", "punching",
        "running_on_spot", "running_on_spot_bugfix", "shake_arms",
        "shake_hips", "shake_shoulders",
    ]

    def __init__(self, root, subjects=None, categories=None,
                 transform=None, pre_transform=None, pre_filter=None):
        subjects = self.subjects if subjects is None else \
            [s.lower() for s in subjects]
        categories = self.categories if categories is None else \
            [c.lower() for c in categories]
        assert all(s in DynamicFAUST.subjects for s in subjects)
        assert all(c in DynamicFAUST.categories for c in categories)
        self.subjects, self.categories = subjects, categories
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["registrations_m.hdf5", "registrations_f.hdf5"]

    @property
    def processed_file_names(self):
        sids = "_".join(s[-2:] for s in self.subjects)
        cats = "_".join("".join(w[0] for w in c.split("_"))
                        for c in self.categories)
        return [f"{sids}_{cats}.npz"]

    def download(self):
        raise RuntimeError(
            f"DynamicFAUST requires registration; download "
            f"registrations_m.hdf5 / registrations_f.hdf5 from {self.url} "
            f"and place them under {self.raw_dir}")

    def process(self):
        import h5py

        fm = h5py.File(self.raw_paths[0], "r")
        ff = h5py.File(self.raw_paths[1], "r")
        faces = np.asarray(fm["faces"])
        graphs = []
        seq = 0
        for sid, cat in product(self.subjects, self.categories):
            idx = f"{sid}_{cat}"
            if idx in fm:
                pos = np.asarray(fm[idx])
            elif idx in ff:
                pos = np.asarray(ff[idx])
            else:
                continue
            t_total = pos.shape[2]  # raw layout (N, 3, T)
            template = _mesh(pos[:, :, 0], faces)
            for t in range(t_total):
                graphs.append(template._replace(
                    nodes=pos[:, :, t].astype(np.float32),
                    globals=np.asarray([[seq, t, t_total]], np.int32)))
            seq += 1
        fm.close()
        ff.close()
        self.save_split(graphs, self.processed_paths[0])


class SHREC2016(InMemoryDataset):
    """reference ``shrec2016.py`` — partial deformable-shape matching.
    Train graphs carry ``y = (N, 4)``: the reference-vertex id in column 0
    (``.baryc_gt`` first column, 0-based) and the barycentric coordinates
    in columns 1-3; the null reference shape is ``dataset.ref``."""

    train_url = ("http://www.dais.unive.it/~shrec2016/data/"
                 "shrec2016_PartialDeformableShapes.zip")
    test_url = ("http://www.dais.unive.it/~shrec2016/data/"
                "shrec2016_PartialDeformableShapes_TestSet.zip")

    categories = ["cat", "centaur", "david", "dog", "horse", "michael",
                  "victoria", "wolf"]
    partialities = ["holes", "cuts"]

    def __init__(self, root, partiality: str, category: str,
                 train: bool = True, transform=None, pre_transform=None,
                 pre_filter=None):
        assert partiality.lower() in self.partialities
        assert category.lower() in self.categories
        self.part = partiality.lower()
        self.cat = category.lower()
        super().__init__(root, transform, pre_transform, pre_filter)
        from ..data.dataset import load_graphs

        self.__ref__ = load_graphs(self.processed_paths[0])[0]
        self.load_split(self.processed_paths[1 if train else 2])

    @property
    def ref(self):
        ref = self.__ref__
        return ref if self.transform is None else self.transform(ref)

    @property
    def raw_file_names(self):
        return ["training", "test"]

    @property
    def processed_file_names(self):
        name = f"{self.part}_{self.cat}.npz"
        return [f"{k}_{name}" for k in ("ref", "training", "test")]

    def download(self):
        download_url(self.train_url, self.raw_dir)
        download_url(self.test_url, self.raw_dir)

    def process(self):
        ref = read_off(osp.join(self.raw_paths[0], "null",
                                f"{self.cat}.off"))
        self.save_split([ref], self.processed_paths[0])

        def sorted_paths(base):
            paths = glob.glob(osp.join(base, self.part,
                                       f"{self.part}_{self.cat}_*.off"))
            paths = [p[:-4] for p in paths]
            return sorted(paths, key=lambda e: (len(e), e))

        train_graphs = []
        for path in sorted_paths(self.raw_paths[0]):
            g = read_off(path + ".off")
            baryc = np.loadtxt(path + ".baryc_gt", ndmin=2)
            y = np.concatenate(
                [baryc[:, :1] - 1, baryc[:, 1:]], axis=1
            ).astype(np.float32)
            train_graphs.append(g._replace(y=y))
        self.save_split(train_graphs, self.processed_paths[1])

        test_graphs = [read_off(p + ".off")
                       for p in sorted_paths(self.raw_paths[1])]
        self.save_split(test_graphs, self.processed_paths[2])


class TOSCA(InMemoryDataset):
    """reference ``tosca.py`` — 80 non-rigid meshes in ``.vert``/``.tri``
    text pairs; the category index is ``y``."""

    url = "http://tosca.cs.technion.ac.il/data/toscahires-asci.zip"

    categories = ["cat", "centaur", "david", "dog", "gorilla", "horse",
                  "michael", "victoria", "wolf"]

    def __init__(self, root, categories=None, transform=None,
                 pre_transform=None, pre_filter=None):
        categories = self.categories if categories is None else \
            [c.lower() for c in categories]
        assert all(c in TOSCA.categories for c in categories)
        self.categories = categories
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return ["cat0.vert", "cat0.tri"]

    @property
    def processed_file_names(self):
        return ["_".join(c[:2] for c in self.categories) + ".npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        graphs = []
        for ci, cat in enumerate(self.categories):
            paths = glob.glob(osp.join(self.raw_dir, f"{cat}*.tri"))
            paths = sorted((p[:-4] for p in paths),
                           key=lambda e: (len(e), e))
            for path in paths:
                pos = np.loadtxt(path + ".vert", ndmin=2)
                tri = np.loadtxt(path + ".tri", dtype=np.int64, ndmin=2)
                tri -= tri.min()  # 1-based in the raw dump
                graphs.append(_mesh(pos, tri,
                                    y=np.asarray([ci], np.int32)))
        self.save_split(graphs, self.processed_paths[0])


class PCPNetDataset(InMemoryDataset):
    """reference ``pcpnet_dataset.py`` — 100k-point clouds with normals +
    curvatures.  ``nodes`` = (pos ‖ normals ‖ curv) → (N, 8); the
    reference's per-shape ``test_idx`` becomes a boolean eval mask in
    ``y`` (column vector)."""

    url = "http://geometry.cs.ucl.ac.uk/projects/2018/pcpnet/pclouds.zip"

    category_files_train = {
        "NoNoise": "trainingset_no_noise.txt",
        "Noisy": "trainingset_whitenoise.txt",
        "VarDensity": "trainingset_vardensity.txt",
        "NoisyAndVarDensity": "trainingset_vardensity_whitenoise.txt",
    }
    category_files_val = {
        "NoNoise": "validationset_no_noise.txt",
        "Noisy": "validationset_whitenoise.txt",
        "VarDensity": "validationset_vardensity.txt",
        "NoisyAndVarDensity": "validationset_vardensity_whitenoise.txt",
    }
    category_files_test = {
        "All": "testset_all.txt",
        "NoNoise": "testset_no_noise.txt",
        "LowNoise": "testset_low_noise.txt",
        "MedNoise": "testset_med_noise.txt",
        "HighNoise": "testset_high_noise.txt",
        "VarDensityStriped": "testset_vardensity_striped.txt",
        "VarDensityGradient": "testset_vardensity_gradient.txt",
    }

    def __init__(self, root, category: str, split: str = "train",
                 transform=None, pre_transform=None, pre_filter=None):
        assert split in ("train", "val", "test")
        table = {"train": self.category_files_train,
                 "val": self.category_files_val,
                 "test": self.category_files_test}[split]
        assert category in table
        self.category, self.split = category, split
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        table = {"train": self.category_files_train,
                 "val": self.category_files_val,
                 "test": self.category_files_test}[self.split]
        return [table[self.category]]

    @property
    def processed_file_names(self):
        return [f"{self.split}_{self.category}.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        with open(self.raw_paths[0]) as f:
            filenames = f.read().split("\n")[:-1]
        graphs = []
        for name in filenames:
            pos = np.loadtxt(osp.join(self.raw_dir, name + ".xyz"),
                             ndmin=2)
            normals = np.loadtxt(
                osp.join(self.raw_dir, name + ".normals"), ndmin=2)
            curv = np.loadtxt(osp.join(self.raw_dir, name + ".curv"),
                              ndmin=2)
            pidx = np.loadtxt(osp.join(self.raw_dir, name + ".pidx"),
                              dtype=np.int64, ndmin=1)
            mask = np.zeros((pos.shape[0], 1), np.int32)
            mask[pidx] = 1
            graphs.append(_point_cloud(
                np.concatenate([pos, normals, curv], axis=1), y=mask))
        self.save_split(graphs, self.processed_paths[0])


class GeometricShapes(InMemoryDataset):
    """reference ``geometry.py`` — 40-class synthetic shape meshes
    (``raw/<category>/{train,test}/*.off``), positions mean-centered."""

    url = ("https://github.com/Yannick-S/geometric_shapes/raw/master/"
           "raw.zip")

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None, pre_filter=None):
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])

    @property
    def raw_file_names(self):
        return ["2d_circle"]

    @property
    def processed_file_names(self):
        return ["training.npz", "test.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        categories = sorted(
            d for d in os.listdir(self.raw_dir)
            if osp.isdir(osp.join(self.raw_dir, d)))
        for si, split in enumerate(("train", "test")):
            graphs = []
            for target, category in enumerate(categories):
                folder = osp.join(self.raw_dir, category, split)
                for path in sorted(glob.glob(osp.join(folder, "*.off"))):
                    g = read_off(path)
                    pos = g.nodes - g.nodes.mean(axis=0, keepdims=True)
                    graphs.append(g._replace(
                        nodes=pos, y=np.asarray([target], np.int32)))
            self.save_split(graphs, self.processed_paths[si])


class TrackingSample(NamedTuple):
    """One TrackML event (reference ``particle.py:11-108``): per-hit
    features ``x`` (cell count / charge sum), positions, and the
    particle→hit assignment index pairs with per-pair weights."""

    x: np.ndarray
    pos: np.ndarray
    y_index: np.ndarray
    y_weight: np.ndarray


class TrackMLParticleTrackingDataset(Dataset):
    """reference ``particle.py`` — on-the-fly per-event loader over the
    Kaggle TrackML csv quadruples (hits/cells/particles/truth)."""

    url = "https://www.kaggle.com/c/trackml-particle-identification"

    def __init__(self, root, transform=None):
        super().__init__(root, transform)
        events = glob.glob(osp.join(self.raw_dir, "event*-hits.csv"))
        self.events = sorted(e.split(osp.sep)[-1].split("-")[0][5:]
                             for e in events)

    @property
    def raw_file_names(self):
        idx = "000001000"
        return [f"event{idx}-{k}.csv"
                for k in ("cells", "hits", "particles", "truth")]

    @property
    def processed_file_names(self):
        return []

    def download(self):
        raise RuntimeError(
            f"download the TrackML csv files from {self.url} and place "
            f"them under {self.raw_dir}")

    def process(self):
        pass  # raw csvs are read on the fly in get()

    def len(self):
        return len(glob.glob(osp.join(self.raw_dir, "event*-hits.csv")))

    def get(self, i: int) -> TrackingSample:
        import pandas as pd

        idx = self.events[i]
        hits = pd.read_csv(
            osp.join(self.raw_dir, f"event{idx}-hits.csv"),
            usecols=["x", "y", "z"], dtype=np.float32)
        pos = hits.values / 1000.0

        cells = pd.read_csv(
            osp.join(self.raw_dir, f"event{idx}-cells.csv"),
            usecols=["hit_id", "value"])
        hit_id = cells["hit_id"].values - 1
        num_cells = np.bincount(hit_id, minlength=len(pos)) / 10.0
        value = np.bincount(hit_id, weights=cells["value"].values,
                            minlength=len(pos))
        x = np.stack([num_cells, value], axis=-1).astype(np.float32)

        truth = pd.read_csv(
            osp.join(self.raw_dir, f"event{idx}-truth.csv"),
            usecols=["hit_id", "particle_id", "weight"])
        hit_id = truth["hit_id"].values - 1
        particle_id = np.unique(truth["particle_id"].values,
                                return_inverse=True)[1] - 1
        weight = truth["weight"].values.astype(np.float32)

        perm = np.argsort(particle_id.astype(np.int64) * len(hit_id)
                          + hit_id)
        hit_id, particle_id, weight = \
            hit_id[perm], particle_id[perm], weight[perm]
        mask = particle_id >= 0
        return TrackingSample(
            x=x, pos=pos,
            y_index=np.stack([particle_id[mask], hit_id[mask]]),
            y_weight=weight[mask])
