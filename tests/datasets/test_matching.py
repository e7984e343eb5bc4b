"""Matching datasets over synthesized raws — reference
``datasets/{willow_object_class,pascal,pascal_pf,ged_dataset}.py``."""
import pickle

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    GEDDataset,
    PascalPF,
    PascalVOCKeypoints,
    WILLOWObjectClass,
)


def _write_png(path, w=64, h=32):
    from PIL import Image

    Image.new("RGB", (w, h), (10, 20, 30)).save(path)


def test_willow_local_raw(tmp_path):
    from scipy.io import savemat

    raw = tmp_path / "raw" / "Duck"
    raw.mkdir(parents=True)
    for d in WILLOWObjectClass.categories:
        (tmp_path / "raw" / d.capitalize()).mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 32, size=(2, 10))
    _write_png(raw / "duck01.png")
    savemat(raw / "duck01.mat", {"pts_coord": pts})
    # a malformed image with 9 keypoints must be skipped
    _write_png(raw / "duck02.png")
    savemat(raw / "duck02.mat", {"pts_coord": pts[:, :9]})

    calls = []

    def extractor(img, pos):
        calls.append(img.shape)
        return np.full((pos.shape[0], 4), 2.0, np.float32)

    ds = WILLOWObjectClass(str(tmp_path), "duck",
                           feature_extractor=extractor)
    assert len(ds._graphs) == 1
    g = ds.get(0)
    assert g.nodes.shape == (10, 6)  # 4 features + 2 pos
    # keypoints rescaled to the 256x256 frame (x scaled by 256/64)
    np.testing.assert_allclose(
        np.asarray(g.nodes[:, 4]), pts[0] * 4.0, rtol=1e-5)
    assert calls == [(256, 256, 3)]


def test_willow_default_features_zero(tmp_path):
    from scipy.io import savemat

    raw = tmp_path / "raw" / "Car"
    raw.mkdir(parents=True)
    for d in WILLOWObjectClass.categories:
        (tmp_path / "raw" / d.capitalize()).mkdir(exist_ok=True)
    _write_png(raw / "car01.png")
    savemat(raw / "car01.mat",
            {"pts_coord": np.ones((2, 10))})
    ds = WILLOWObjectClass(str(tmp_path), "car")
    g = ds.get(0)
    assert g.nodes.shape == (10, 1026)  # VGG width + pos
    assert (np.asarray(g.nodes[:, :-2]) == 0).all()


def test_pascal_voc_keypoints_local_raw(tmp_path):
    raw = tmp_path / "raw"
    (raw / "images" / "JPEGImages").mkdir(parents=True)
    (raw / "images" / "Annotations").mkdir()
    (raw / "annotations" / "car").mkdir(parents=True)

    info = (
        "<annotation><object>"
        "<truncated>0</truncated><difficult>0</difficult>"
        "<bndbox><xmin>2</xmin><ymin>2</ymin>"
        "<xmax>60</xmax><ymax>30</ymax></bndbox>"
        "</object></annotation>")
    (raw / "images" / "Annotations" / "2008_000001.xml").write_text(info)
    _write_png(raw / "images" / "JPEGImages" / "2008_000001.jpg")
    kp = ('<annotation><keypoints>'
          '<keypoint name="wheel" x="10" y="10" z="0" visible="1"/>'
          '<keypoint name="door" x="20" y="15" z="0" visible="1"/>'
          '</keypoints></annotation>')
    (raw / "annotations" / "car" / "2008_000001_1.xml").write_text(kp)
    cat_idx = PascalVOCKeypoints.categories.index("car")
    train = [[] for _ in range(20)]
    test = [[] for _ in range(20)]
    train[cat_idx] = ["car/2008_000001_1.xml"]
    np.savez(raw / "splits.npz",
             train=np.asarray(train, object),
             test=np.asarray(test, object))

    ds = PascalVOCKeypoints(str(tmp_path), "car", train=True)
    assert len(ds._graphs) == 1
    g = ds.get(0)
    assert g.y.tolist() == [0, 1]  # keypoint-label ids
    pos = np.asarray(g.nodes[:, -2:])
    assert (pos >= 0).all() and (pos <= 256).all()
    te = PascalVOCKeypoints(str(tmp_path), "car", train=False)
    assert len(te._graphs) == 0


def test_pascal_pf_local_raw(tmp_path):
    from scipy.io import savemat

    raw = tmp_path / "raw"
    ann = raw / "Annotations" / "car"
    ann.mkdir(parents=True)
    kps = np.full((6, 2), np.nan)
    kps[[0, 2, 3]] = [[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]]
    savemat(ann / "im1.mat", {"kps": kps})
    savemat(ann / "im2.mat", {"kps": kps})

    cat_idx = PascalPF.categories.index("car")
    pair_cells = np.empty((1, 20), object)
    for i in range(20):
        pair_cells[0, i] = np.empty((0, 2), object)
    pairs = np.empty((1, 2), object)
    pairs[0, 0] = np.asarray(["im1"], object)
    pairs[0, 1] = np.asarray(["im2"], object)
    pair_cells[0, cat_idx] = pairs
    savemat(raw / "parsePascalVOC.mat",
            {"PascalVOC": {"pair": pair_cells}})

    ds = PascalPF(str(tmp_path), "car")
    assert len(ds._graphs) == 2
    g = ds.get(0)
    assert g.y.tolist() == [0, 2, 3]  # valid-keypoint indices
    pos = np.asarray(g.nodes[:, -2:])
    assert np.linalg.norm(pos, axis=1).max() <= 1 + 1e-6  # unit sphere
    assert ds.pairs == [(0, 1)]


def test_ged_dataset_local_raw(tmp_path):
    raw = tmp_path / "raw" / "LINUX"
    (raw / "train").mkdir(parents=True)
    (raw / "test").mkdir()

    gexf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">'
        '<graph defaultedgetype="undirected">'
        "<nodes>"
        '<node id="0" label="0"/><node id="1" label="1"/>'
        '<node id="2" label="2"/>'
        "</nodes>"
        '<edges><edge id="0" source="0" target="1"/>'
        '<edge id="1" source="1" target="2"/></edges>'
        "</graph></gexf>")
    (raw / "train" / "4.gexf").write_text(gexf)
    (raw / "train" / "10.gexf").write_text(gexf)
    (raw / "test" / "7.gexf").write_text(gexf)
    with open(raw / "ged.pickle", "wb") as f:
        pickle.dump({(4, 10): 1.0, (4, 7): 3.0}, f)

    tr = GEDDataset(str(tmp_path), "LINUX", train=True)
    te = GEDDataset(str(tmp_path), "LINUX", train=False)
    assert len(tr._graphs) == 2 and len(te._graphs) == 1
    g = tr.get(0)
    assert int(g.n_edge[0]) == 4  # undirected -> both directions
    assert int(g.globals[0, 0]) == 0  # global id
    assert int(te.get(0).globals[0, 0]) == 2
    assert tr.ged[0, 1] == 1.0 and tr.ged[1, 0] == 1.0
    assert tr.ged[0, 2] == 3.0 and np.isinf(tr.ged[1, 2])
    np.testing.assert_allclose(tr.norm_ged[0, 1], 1.0 / 3.0)
