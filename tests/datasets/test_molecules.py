"""ZINC/MoleculeNet/QM7b over synthesized raws + SMILES parser unit tests
— reference ``datasets/{zinc,molecule_net,qm7}.py``."""
import pickle

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    ZINC,
    MoleculeNet,
    QM7b,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.smiles import (
    parse_smiles,
)


# --------------------------------------------------------------------------
# SMILES parser
# --------------------------------------------------------------------------

def test_parse_smiles_ethanol():
    x, ei, ea = parse_smiles("CCO")
    assert x.shape == (3, 9)
    assert x[:, 0].tolist() == [6, 6, 8]  # C C O
    assert x[:, 4].tolist() == [3, 2, 1]  # implicit hydrogens
    assert ei.shape == (2, 4)  # 2 bonds, both directions
    assert (ea[:, 0] == 1).all()  # single bonds


def test_parse_smiles_benzene_aromatic_ring():
    x, ei, ea = parse_smiles("c1ccccc1")
    assert x.shape[0] == 6
    assert (x[:, 7] == 1).all()  # aromatic
    assert (x[:, 8] == 1).all()  # in ring
    assert (x[:, 4] == 1).all()  # one H each
    assert ei.shape == (2, 12) and (ea[:, 0] == 4).all()


def test_parse_smiles_brackets_charge_and_bonds():
    x, ei, ea = parse_smiles("[NH4+].[Cl-]")
    assert x[:, 0].tolist() == [7, 17]
    assert x[0, 4] == 4 and x[0, 3] == 6  # 4 Hs, charge +1 -> index 6
    assert x[1, 3] == 4  # charge -1 -> index 4
    assert ei.shape == (2, 0)  # disconnected
    x, _, ea = parse_smiles("C=C#N")
    assert sorted(ea[:, 0].tolist()) == [2, 2, 3, 3]


def test_parse_smiles_rejects_garbage():
    assert parse_smiles("C1CC") is None  # unclosed ring
    assert parse_smiles("X~Q") is None


# --------------------------------------------------------------------------
# dataset classes
# --------------------------------------------------------------------------

def test_zinc_local_raw(tmp_path):
    import torch

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    adj = torch.zeros(3, 3, dtype=torch.long)
    adj[0, 1] = adj[1, 0] = 1
    adj[1, 2] = adj[2, 1] = 2
    mol = {"atom_type": torch.tensor([0, 1, 2]),
           "logP_SA_cycle_normalized": torch.tensor([0.5]),
           "bond_type": adj}
    for split in ("train", "val", "test"):
        with open(raw / f"{split}.pickle", "wb") as f:
            pickle.dump([mol, mol], f)
        (raw / f"{split}.index").write_text("0,")
    full = ZINC(str(tmp_path), subset=False, split="train")
    assert len(full._graphs) == 2
    sub = ZINC(str(tmp_path), subset=True, split="val")
    assert len(sub._graphs) == 1
    g = sub.get(0)
    assert g.nodes.shape == (3, 1) and int(g.n_edge[0]) == 4
    assert sorted(np.asarray(g.edges).tolist()) == [1, 1, 2, 2]
    np.testing.assert_allclose(g.y, [0.5])


def test_moleculenet_local_raw(tmp_path):
    raw = tmp_path / "esol" / "raw"
    raw.mkdir(parents=True)
    (raw / "delaney-processed.csv").write_text(
        "Compound ID,junk,measured,smiles\n"
        "Ethanol,x,-0.77,CCO\n"
        "Garbage,x,1.0,C1CC\n"  # must be skipped
        "Benzene,x,-3.1,c1ccccc1\n")
    ds = MoleculeNet(str(tmp_path), "ESOL")
    assert len(ds._graphs) == 2  # garbage skipped like rdkit rejects
    g = ds.get(0)
    assert g.nodes.shape == (3, 9)
    np.testing.assert_allclose(np.asarray(g.globals), [[-0.77]])


def test_qm7b_local_raw(tmp_path):
    import scipy.io

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    X = np.zeros((2, 4, 4))
    X[0, :3, :3] = [[36.0, 1.0, 0], [1.0, 36.0, 2.0], [0, 2.0, 36.0]]
    X[1, :2, :2] = [[73.0, 3.0], [3.0, 73.0]]
    T = np.arange(28, dtype=np.float64).reshape(2, 14)
    scipy.io.savemat(raw / "qm7b.mat", {"X": X, "T": T})
    ds = QM7b(str(tmp_path))
    assert len(ds._graphs) == 2
    g = ds.get(0)
    assert int(g.n_node[0]) == 3
    assert g.globals.shape == (1, 14)
    # Coulomb values become edge attrs (diagonal included, qm7.py:52-55)
    assert 36.0 in np.asarray(g.edges)
