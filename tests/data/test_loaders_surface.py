"""DataListLoader / DenseDataLoader / SAINT subclasses / download helpers —
reference ``data/__init__.py`` surface completion."""
import os.path as osp

import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    DataListLoader,
    DenseDataLoader,
    GraphSAINTEdgeSampler,
    GraphSAINTNodeSampler,
    GraphSAINTRandomWalkSampler,
    download_url,
    extract_gz,
    extract_tar,
    extract_zip,
    from_edge_index,
)


def _graphs(num=6, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num):
        n = int(rng.integers(4, 9))
        ei = np.stack([rng.integers(0, n, 2 * n), rng.integers(0, n, 2 * n)])
        g = from_edge_index(rng.normal(size=(n, 3)).astype(np.float32), ei)
        out.append(g._replace(y=np.asarray([i % 2], np.int32)))
    return out


def test_data_list_loader_yields_lists():
    graphs = _graphs()
    loader = DataListLoader(graphs, batch_size=3)
    batches = list(loader)
    assert len(batches) == 2
    assert isinstance(batches[0], list) and len(batches[0]) == 3


def test_dense_data_loader_stacks():
    graphs = _graphs()
    loader = DenseDataLoader(graphs, batch_size=2)
    b = next(iter(loader))
    n = loader.max_nodes
    assert b["x"].shape == (2, n, 3)
    assert b["adj"].shape == (2, n, n)
    assert b["mask"].shape == (2, n)
    assert b["y"].shape == (2, 1)
    # adjacency rows outside the mask are empty
    assert b["adj"][0][~b["mask"][0]].sum() == 0


def test_saint_subclasses():
    g = _graphs(1, seed=3)[0]
    for cls in (GraphSAINTNodeSampler, GraphSAINTEdgeSampler,
                GraphSAINTRandomWalkSampler):
        sampler = cls(g, budget=4, num_steps=2, sample_coverage=3)
        sub, nodes = next(iter(sampler))
        assert int(np.sum(sub.n_node)) == len(nodes) >= 1


def test_download_and_extract(tmp_path):
    # existing file short-circuits (no network touched)
    p = tmp_path / "file.txt"
    p.write_text("hi")
    assert download_url("http://example.invalid/file.txt", str(tmp_path)) == str(p)
    # unreachable url raises with the local-files hint
    with pytest.raises(RuntimeError, match="local files"):
        download_url("http://example.invalid/missing.bin", str(tmp_path))

    import gzip, tarfile, zipfile
    (tmp_path / "a.txt").write_text("A")
    with tarfile.open(tmp_path / "t.tar.gz", "w:gz") as t:
        t.add(tmp_path / "a.txt", arcname="a_tar.txt")
    extract_tar(str(tmp_path / "t.tar.gz"), str(tmp_path))
    assert (tmp_path / "a_tar.txt").read_text() == "A"
    with zipfile.ZipFile(tmp_path / "z.zip", "w") as z:
        z.writestr("a_zip.txt", "Z")
    extract_zip(str(tmp_path / "z.zip"), str(tmp_path))
    assert (tmp_path / "a_zip.txt").read_text() == "Z"
    with gzip.open(tmp_path / "g.txt.gz", "wb") as f:
        f.write(b"G")
    extract_gz(str(tmp_path / "g.txt.gz"), str(tmp_path))
    assert (tmp_path / "g.txt").read_bytes() == b"G"


def test_temporal_data_split_and_batches():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
        TemporalData,
    )

    n = 100
    td = TemporalData(
        src=np.arange(n) % 7,
        dst=(np.arange(n) + 1) % 7,
        t=np.arange(n),
        msg=np.ones((n, 4), np.float32),
    )
    assert td.num_events == n and td.num_nodes == 7
    tr, va, te = td.train_val_test_split(val_ratio=0.15, test_ratio=0.15)
    assert tr.num_events + va.num_events + te.num_events == n
    assert tr.t.max() < va.t.min() <= va.t.max() < te.t.min()
    sizes = [b.num_events for b in td.seq_batches(32)]
    assert sizes == [32, 32, 32, 4]
    sub = td[np.asarray([5, 6])]
    assert sub.src.tolist() == [5, 6]
