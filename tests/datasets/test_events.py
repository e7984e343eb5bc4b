"""ICEWS18/GDELT/BitcoinOTC/JODIE over synthesized raws — reference
``datasets/{icews,gdelt,bitcoin_otc,jodie}.py``."""
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    GDELT,
    ICEWS18,
    BitcoinOTC,
    JODIEDataset,
)


class _TinyICEWS(ICEWS18):
    splits = [0, 4, 6, 8]


class _TinyGDELT(GDELT):
    splits = [0, 4, 6, 8]


def _write_quadruples(raw, time_mult):
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = np.stack([
        rng.integers(0, 5, 8), rng.integers(0, 3, 8),
        rng.integers(0, 5, 8),
        np.arange(8) * time_mult,
    ], axis=1)
    for name, sl in (("train", slice(0, 4)), ("valid", slice(4, 6)),
                     ("test", slice(6, 8))):
        np.savetxt(raw / f"{name}.txt", rows[sl], fmt="%d",
                   delimiter="\t")
    return rows


def test_icews18_local_raw(tmp_path):
    rows = _write_quadruples(tmp_path / "raw", time_mult=24)
    tr = _TinyICEWS(str(tmp_path), split="train")
    va = _TinyICEWS(str(tmp_path), split="val")
    te = _TinyICEWS(str(tmp_path), split="test")
    assert tr.data.num_events == 4
    assert va.data.num_events == 2 and te.data.num_events == 2
    # 24h buckets: timestamps i*24 -> i
    np.testing.assert_array_equal(tr.data.t, [0, 1, 2, 3])
    # min-shifted entity/relation ids
    assert tr.data.src.min() >= 0 and tr.data.y.min() >= 0


def test_gdelt_local_raw(tmp_path):
    _write_quadruples(tmp_path / "raw", time_mult=15)
    tr = _TinyGDELT(str(tmp_path), split="train")
    np.testing.assert_array_equal(tr.data.t, [0, 1, 2, 3])


def test_bitcoin_otc_windows(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    step = 13.8 * 24 * 3600
    lines = []
    # 3 windows x 2 edges, ratings 1..6, node ids offset by 2
    for w in range(3):
        for j in range(2):
            lines.append(f"{2 + j},{3 + j},{w * 2 + j + 1},"
                         f"{1000.0 + w * step + j}")
    (raw / "soc-sign-bitcoinotc.csv").write_text("\n".join(lines) + "\n")
    ds = BitcoinOTC(str(tmp_path), edge_window_size=2)
    assert len(ds._graphs) == 3
    # window 0: 2 edges; window 1: trailing window of 2 -> 4 edges
    assert int(ds.get(0).n_edge[0]) == 2
    assert int(ds.get(1).n_edge[0]) == 4
    assert int(ds.get(2).n_edge[0]) == 4  # windows 1+2 only (size 2)
    # ids min-shifted to 0
    assert int(ds.get(0).senders.min()) == 0


def test_jodie_local_raw(tmp_path):
    raw = tmp_path / "mooc" / "raw"
    raw.mkdir(parents=True)
    (raw / "mooc.csv").write_text(
        "user,item,t,label,f0,f1\n"
        "0,0,1.0,0,0.1,0.2\n"
        "1,1,2.0,1,0.3,0.4\n"
        "0,1,3.0,0,0.5,0.6\n")
    ds = JODIEDataset(str(tmp_path), "mooc")
    d = ds.data
    assert d.num_events == 3
    # items offset past users (jodie.py:43)
    assert d.dst.min() == int(d.src.max()) + 1
    assert d.msg.shape == (3, 2)
    np.testing.assert_array_equal(d.y, [0, 1, 0])
