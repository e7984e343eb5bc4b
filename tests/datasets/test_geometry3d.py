"""3D datasets over synthesized raws — reference ``datasets/{shapenet,
s3dis,coma,dynamic_faust,shrec2016,tosca,pcpnet_dataset,geometry,
particle}.py``."""
import json

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    CoMA,
    DynamicFAUST,
    GeometricShapes,
    PCPNetDataset,
    S3DIS,
    ShapeNet,
    SHREC2016,
    TOSCA,
    TrackMLParticleTrackingDataset,
)

_OFF = "OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
_PLY = ("ply\nformat ascii 1.0\nelement vertex 3\nproperty float x\n"
        "property float y\nproperty float z\nelement face 1\n"
        "property list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")


def test_shapenet_local_raw(tmp_path):
    raw = tmp_path / "raw"
    cat = ShapeNet.category_ids["Cap"]
    (raw / cat).mkdir(parents=True)
    (raw / "train_test_split").mkdir()
    rng = np.random.default_rng(0)
    for i, name in enumerate(("a", "b", "c")):
        rows = np.concatenate(
            [rng.normal(size=(5, 6)),
             np.full((5, 1), 6 + (i % 2))], axis=1)
        np.savetxt(raw / cat / f"{name}.txt", rows)
    for split, names in (("train", ["a"]), ("val", ["b"]),
                         ("test", ["c"])):
        with open(raw / "train_test_split"
                  / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump([f"shape_data/{cat}/{n}" for n in names], f)

    ds = ShapeNet(str(tmp_path), categories="Cap", split="trainval")
    assert len(ds._graphs) == 2
    g = ds.get(0)
    assert g.nodes.shape == (5, 6)  # pos + normals
    assert g.y.shape == (5,)
    assert int(g.globals[0, 0]) == 0  # category index
    no_norm = ShapeNet(str(tmp_path), categories="Cap", split="test",
                       include_normals=False)
    assert no_norm.get(0).nodes.shape == (5, 3)
    assert ds.y_mask.shape == (16, 50) and ds.y_mask[2, 6]


def test_s3dis_local_raw(tmp_path):
    import h5py

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with h5py.File(raw / "ply_data_all_0.h5", "w") as f:
        f["data"] = rng.normal(size=(3, 16, 9)).astype(np.float32)
        f["label"] = rng.integers(0, 13, (3, 16))
    (raw / "all_files.txt").write_text("data/ply_data_all_0.h5\n")
    (raw / "room_filelist.txt").write_text(
        "Area_1_office\nArea_6_office\nArea_1_hall\n")
    tr = S3DIS(str(tmp_path), test_area=6, train=True)
    te = S3DIS(str(tmp_path), test_area=6, train=False)
    assert len(tr._graphs) == 2 and len(te._graphs) == 1
    assert tr.get(0).nodes.shape == (16, 9)


def test_coma_local_raw(tmp_path):
    raw = tmp_path / "raw" / "COMA_data" / "FaceTalk_0"
    for cat in CoMA.categories:
        d = raw / cat
        d.mkdir(parents=True)
        (d / "m0.ply").write_text(_PLY)
    tr = CoMA(str(tmp_path), train=True)
    te = CoMA(str(tmp_path), train=False)
    assert len(tr._graphs) == 12 and len(te._graphs) == 0
    assert sorted(int(g.y[0]) for g in tr._graphs) == list(range(12))


def test_dynamic_faust_local_raw(tmp_path):
    import h5py

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with h5py.File(raw / "registrations_m.hdf5", "w") as f:
        f["faces"] = np.asarray([[0, 1, 2]])
        f["50002_hips"] = rng.normal(size=(3, 3, 4))  # (N, 3, T)
    with h5py.File(raw / "registrations_f.hdf5", "w") as f:
        f["50004_knees"] = rng.normal(size=(3, 3, 2))
    ds = DynamicFAUST(str(tmp_path), subjects=["50002", "50004"],
                      categories=["hips", "knees"])
    assert len(ds._graphs) == 6  # 4 + 2 frames
    g0 = ds.get(0)
    assert g0.nodes.shape == (3, 3)
    assert g0.globals[0].tolist() == [0, 0, 4]  # seq, t, T
    assert ds.get(3).globals[0].tolist() == [0, 3, 4]
    assert ds.get(4).globals[0].tolist() == [1, 0, 2]
    assert int(g0.n_edge[0]) == 6  # template triangle, both directions


def test_shrec2016_local_raw(tmp_path):
    raw = tmp_path / "raw"
    (raw / "training" / "null").mkdir(parents=True)
    (raw / "training" / "holes").mkdir()
    (raw / "test" / "holes").mkdir(parents=True)
    (raw / "training" / "null" / "cat.off").write_text(_OFF)
    (raw / "training" / "holes" / "holes_cat_1.off").write_text(_OFF)
    (raw / "training" / "holes" / "holes_cat_1.baryc_gt").write_text(
        "1 0.5 0.3 0.2\n2 1.0 0.0 0.0\n3 0.2 0.2 0.6\n")
    (raw / "test" / "holes" / "holes_cat_9.off").write_text(_OFF)
    ds = SHREC2016(str(tmp_path), "Holes", "Cat", train=True)
    assert int(ds.ref.n_node[0]) == 3
    g = ds.get(0)
    assert g.y.shape == (3, 4)
    np.testing.assert_allclose(g.y[:, 0], [0, 1, 2])  # 0-based ref ids
    te = SHREC2016(str(tmp_path), "Holes", "Cat", train=False)
    assert len(te._graphs) == 1


def test_tosca_local_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    vert = "0 0 0\n1 0 0\n0 1 0\n"
    tri = "1 2 3\n"  # 1-based
    for name in ("cat0", "dog0", "dog1"):
        (raw / f"{name}.vert").write_text(vert)
        (raw / f"{name}.tri").write_text(tri)
    ds = TOSCA(str(tmp_path), categories=["cat", "dog"])
    assert len(ds._graphs) == 3
    assert [int(g.y[0]) for g in ds._graphs] == [0, 1, 1]
    assert int(ds.get(0).senders.max()) == 2  # 1-based shifted


def test_pcpnet_local_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    (raw / "trainingset_no_noise.txt").write_text("shape0\n")
    rng = np.random.default_rng(0)
    np.savetxt(raw / "shape0.xyz", rng.normal(size=(6, 3)))
    np.savetxt(raw / "shape0.normals", rng.normal(size=(6, 3)))
    np.savetxt(raw / "shape0.curv", rng.normal(size=(6, 2)))
    np.savetxt(raw / "shape0.pidx", [1, 4], fmt="%d")
    ds = PCPNetDataset(str(tmp_path), "NoNoise", split="train")
    g = ds.get(0)
    assert g.nodes.shape == (6, 8)
    np.testing.assert_array_equal(g.y[:, 0], [0, 1, 0, 0, 1, 0])


def test_geometric_shapes_local_raw(tmp_path):
    raw = tmp_path / "raw"
    for cat in ("2d_circle", "cube"):
        for split in ("train", "test"):
            d = raw / cat / split
            d.mkdir(parents=True)
            (d / "0.off").write_text(_OFF)
    tr = GeometricShapes(str(tmp_path), train=True)
    assert len(tr._graphs) == 2
    g = tr.get(0)
    np.testing.assert_allclose(g.nodes.mean(axis=0), 0, atol=1e-6)


def test_trackml_local_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    idx = "000001000"
    (raw / f"event{idx}-hits.csv").write_text(
        "hit_id,x,y,z\n1,1000,0,0\n2,0,1000,0\n3,0,0,1000\n")
    (raw / f"event{idx}-cells.csv").write_text(
        "hit_id,value\n1,0.5\n1,0.25\n2,1.0\n3,0.125\n")
    (raw / f"event{idx}-particles.csv").write_text("particle_id\n7\n")
    (raw / f"event{idx}-truth.csv").write_text(
        "hit_id,particle_id,weight\n1,7,0.5\n2,7,0.25\n3,0,0.1\n")
    ds = TrackMLParticleTrackingDataset(str(tmp_path))
    assert ds.len() == 1
    s = ds.get(0)
    np.testing.assert_allclose(s.pos[0], [1.0, 0, 0])
    np.testing.assert_allclose(s.x[0], [0.2, 0.75])  # 2 cells/10, sum
    # particle_id 0 maps to -1 after unique-inverse -1 -> dropped
    assert s.y_index.shape == (2, 2)
    np.testing.assert_allclose(s.y_weight, [0.5, 0.25])
