"""Entities/WordNet18/DBP15K/AMiner/SNAP over synthesized raws —
reference ``datasets/{entities,word_net,dbp15k,aminer,snap_dataset}.py``."""
import gzip
import pickle

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    AMiner,
    DBP15K,
    Entities,
    SNAPDataset,
    WordNet18,
)


def test_entities_local_raw(tmp_path):
    raw = tmp_path / "aifb" / "raw"
    raw.mkdir(parents=True)
    nt = (
        "<http://a/p1> <http://rel/r1> <http://a/p2> .\n"
        "<http://a/p2> <http://rel/r1> <http://a/p3> .\n"
        "<http://a/p1> <http://rel/r2> <http://a/p3> .\n"
    )
    with gzip.open(raw / "aifb_stripped.nt.gz", "wt") as f:
        f.write(nt)
    head = "person\tlabel_affiliation\n"
    (raw / "completeDataset.tsv").write_text(
        head + "http://a/p1\tg1\nhttp://a/p2\tg2\nhttp://a/p3\tg1\n")
    (raw / "trainingSet.tsv").write_text(
        head + "http://a/p1\tg1\nhttp://a/p2\tg2\n")
    (raw / "testSet.tsv").write_text(head + "http://a/p3\tg1\n")

    ds = Entities(str(tmp_path), "AIFB")
    g = ds.get(0)
    assert int(g.n_node[0]) == 3
    assert int(g.n_edge[0]) == 6  # 3 triples doubled
    # r1 occurs twice -> relation 0; forward/inverse = 2*rel, 2*rel+1
    assert ds.num_relations == 4
    assert sorted(np.unique(np.asarray(g.edges)).tolist()) == [0, 1, 2, 3]
    assert len(ds.train_idx) == 2 and len(ds.test_idx) == 1
    assert ds.train_y.tolist() == [0, 1]  # labels sorted g1<g2


def test_wordnet18_local_raw(tmp_path):
    import networkx as nx

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    G = nx.DiGraph()
    G.add_edge(0, 1, e_label=np.int64(3))
    G.add_edge(1, 2, e_label=np.int64(7))
    with open(raw / "WN18.gpickle", "wb") as f:
        pickle.dump(G, f)
    ds = WordNet18(str(tmp_path))
    g = ds.get(0)
    assert int(g.n_node[0]) == 3 and int(g.n_edge[0]) == 2
    assert sorted(np.asarray(g.edges).tolist()) == [3, 7]


def test_dbp15k_local_raw(tmp_path):
    raw = tmp_path / "raw"
    d = raw / "zh_en"
    d.mkdir(parents=True)
    (raw / "sub.glove.300d").write_text(
        "hello " + " ".join(["0.5"] * 300) + "\n"
        + " ".join(["0.1"] * 300) + "\n")  # short line = UNK
    (d / "triples_1").write_text("10\t0\t11\n11\t1\t12\n")
    (d / "id_features_1").write_text(
        "10\thello world\n11\thello\n12\t\n")
    (d / "triples_2").write_text("5\t0\t6\n")
    (d / "id_features_2").write_text("5\thello\n6\thello hello\n")
    (d / "train.examples.20").write_text("10\t5\t1\n11\t6\t0\n")
    (d / "test.examples.1000").write_text("12\t6\t1\n")
    for p in DBP15K.pairs:
        (raw / p).mkdir(exist_ok=True)

    ds = DBP15K(str(tmp_path), "zh_en")
    assert ds.x1.shape == (3, 300) and ds.x2.shape == (2, 300)
    # node 10 = "hello world" = hello + UNK = 0.5 + 0.1
    np.testing.assert_allclose(ds.x1[0], 0.6, rtol=1e-6)
    assert ds.edge_index1.shape == (2, 2)
    assert ds.train_y.shape == (2, 1)  # masked pair (11,6) dropped
    assert ds.test_y.shape == (2, 1)


def test_aminer_local_raw(tmp_path):
    raw = tmp_path / "raw"
    label = raw / "label"
    label.mkdir(parents=True)
    (raw / "id_author.txt").write_text("0\talice\n1\tbob\n")
    (raw / "id_conf.txt").write_text("0\tkdd\n1\tnips\n")
    (raw / "paper.txt").write_text("0\tp0\n1\tp1\n2\tp2\n")
    (raw / "paper_author.txt").write_text("0\t0\n1\t1\n2\t0\n0\t0\n")
    (raw / "paper_conf.txt").write_text("0\t0\n1\t1\n2\t1\n")
    (label / "googlescholar.8area.author.label.txt").write_text(
        "alice 3\nbob 1\n")
    (label / "googlescholar.8area.venue.label.txt").write_text("kdd 2\n")

    ds = AMiner(str(tmp_path))
    pa = ds.edge_index_dict[("paper", "written by", "author")]
    assert pa.shape == (2, 3)  # duplicate (0,0) coalesced
    ap = ds.edge_index_dict[("author", "wrote", "paper")]
    np.testing.assert_array_equal(ap, pa[::-1])
    assert ds.y_dict["author"].tolist() == [2, 0]  # labels are 1-based
    assert ds.num_nodes_dict == {"paper": 3, "author": 2, "venue": 2}


def test_snap_wiki_vote(tmp_path):
    raw = tmp_path / "wiki-vote" / "raw"
    raw.mkdir(parents=True)
    body = "# c\n# c\n# c\n# c\n30\t40\n40\t50\n30\t40\n"
    with gzip.open(raw / "wiki-Vote.txt.gz", "wt") as f:
        f.write(body)
    ds = SNAPDataset(str(tmp_path), "wiki-vote")
    g = ds.get(0)
    assert int(g.n_node[0]) == 3  # relabeled to 0..2
    assert int(g.n_edge[0]) == 2  # duplicate coalesced


def test_snap_ego_facebook(tmp_path):
    raw = tmp_path / "ego-facebook" / "raw"
    raw.mkdir(parents=True)
    (raw / "facebook.tar.gz").write_bytes(b"")  # raw-contract marker
    (raw / "0.circles").write_text("circle0\t1\t2\n")
    (raw / "0.edges").write_text("1 2\n2 3\n")
    (raw / "0.egofeat").write_text("1 0\n")
    (raw / "0.feat").write_text("1 1 0\n2 0 1\n3 1 1\n")
    (raw / "0.featnames").write_text("0 f a\n1 f b\n")
    ds = SNAPDataset(str(tmp_path), "ego-facebook")
    g = ds.get(0)
    n = int(g.n_node[0])
    assert n == 4  # 3 alters + ego
    # ego connected to everyone
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    ego = n - 1
    assert all(((s == ego) & (r == k)).any() for k in range(ego))
    assert g.nodes.shape == (4, 2)
