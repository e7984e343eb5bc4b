"""A small from-scratch SMILES reader producing OGB-style features.

The reference's :class:`MoleculeNet` (``datasets/molecule_net.py:151-213``)
featurizes SMILES strings through rdkit into the Open Graph Benchmark
layout: 9 integer atom features and 3 integer bond features.  rdkit is not
in this image, so this module parses the SMILES grammar directly (atoms,
bracket atoms, bonds, branches, ring closures, disconnections) and fills
the same feature layout with these documented simplifications:

* ``chirality``, ``num_radical_electrons``, ``hybridization`` and bond
  ``stereo`` / ``is_conjugated`` are emitted as category 0 (rdkit derives
  them from perception passes this parser does not run);
* implicit hydrogen counts follow the SMILES valence rules (smallest
  standard valence that fits the bond-order sum, one slot donated to the
  ring for aromatic atoms) — exact for bracket atoms, which carry explicit
  H counts.

The 12 MoleculeNet tasks' molecules are overwhelmingly organic-subset
SMILES, for which this grammar is complete.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

__all__ = ["parse_smiles", "X_DIM", "E_DIM"]

X_DIM = 9
E_DIM = 3

_SYMBOLS = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Ti": 22, "Cr": 24,
    "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29, "Zn": 30, "Ga": 31,
    "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Zr": 40, "Mo": 42, "Ru": 44,
    "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50, "Sb": 51,
    "Te": 52, "I": 53, "Ba": 56, "W": 74, "Pt": 78, "Au": 79, "Hg": 80,
    "Tl": 81, "Pb": 82, "Bi": 83,
}
# standard valence lists (smallest-that-fits rule, Daylight spec)
_VALENCES = {5: (3,), 6: (4,), 7: (3, 5), 8: (2,), 15: (3, 5),
             16: (2, 4, 6), 9: (1,), 17: (1,), 35: (1,), 53: (1,)}
_ORGANIC = ("Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I")
_AROMATIC = ("b", "c", "n", "o", "p", "s", "se", "as")
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, ":": 4, "/": 1, "\\": 1}


class _Atom:
    __slots__ = ("z", "aromatic", "charge", "explicit_h", "bonds")

    def __init__(self, z: int, aromatic: bool, charge: int = 0,
                 explicit_h: Optional[int] = None):
        self.z = z
        self.aromatic = aromatic
        self.charge = charge
        self.explicit_h = explicit_h
        self.bonds: List[int] = []  # bond orders (4 = aromatic)


def _parse_bracket(s: str, i: int) -> Tuple[_Atom, int]:
    """Parse ``[...]`` starting after the ``[``; returns (atom, next_i)."""
    j = s.index("]", i)
    body = s[i:j]
    k = 0
    while k < len(body) and body[k].isdigit():  # isotope (ignored)
        k += 1
    # element symbol (allow aromatic lowercase)
    if k + 1 < len(body) and body[k:k + 2] in _SYMBOLS:
        sym, k = body[k:k + 2], k + 2
        aromatic = False
    elif k + 1 < len(body) and body[k:k + 2].capitalize() in _SYMBOLS \
            and body[k:k + 2] in _AROMATIC:
        sym, k = body[k:k + 2].capitalize(), k + 2
        aromatic = True
    else:
        ch = body[k]
        aromatic = ch.islower()
        sym = ch.upper() if ch != "n" or aromatic else ch
        sym = ch.capitalize()
        k += 1
    z = _SYMBOLS.get(sym)
    if z is None:
        raise ValueError(f"unknown element {sym!r} in [{body}]")
    while k < len(body) and body[k] in "@":  # chirality (ignored)
        k += 1
    explicit_h = 0
    if k < len(body) and body[k] == "H":
        k += 1
        explicit_h = 1
        if k < len(body) and body[k].isdigit():
            explicit_h = int(body[k])
            k += 1
    charge = 0
    while k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        if k < len(body) and body[k].isdigit():
            charge += sign * int(body[k])
            k += 1
        else:
            charge += sign
    return _Atom(z, aromatic, charge, explicit_h), j + 1


def parse_smiles(smiles: str):
    """Parse a SMILES string.

    Returns ``(x, edge_index, edge_attr)`` numpy arrays: ``x`` is
    ``(n_atoms, 9)`` int32 in the OGB atom-feature layout, ``edge_index``
    is ``(2, n_bonds*2)`` (both directions, sorted like
    ``molecule_net.py:215-218``), ``edge_attr`` is ``(n_bonds*2, 3)``.
    Returns ``None`` on a grammar error (the reference skips molecules
    rdkit rejects, ``molecule_net.py:170-172``)."""
    import numpy as np

    try:
        atoms: List[_Atom] = []
        bonds: Dict[Tuple[int, int], int] = {}
        stack: List[int] = []
        prev: Optional[int] = None
        pending_order: Optional[int] = None
        rings: Dict[str, Tuple[int, Optional[int]]] = {}
        i, n = 0, len(smiles)

        def add_bond(a: int, b: int, order: Optional[int]):
            if order is None:
                order = 4 if (atoms[a].aromatic and atoms[b].aromatic) else 1
            bonds[(min(a, b), max(a, b))] = order
            atoms[a].bonds.append(order)
            atoms[b].bonds.append(order)

        while i < n:
            ch = smiles[i]
            if ch == "(":
                stack.append(prev)
                i += 1
            elif ch == ")":
                prev = stack.pop()
                i += 1
            elif ch == ".":
                prev = None
                pending_order = None
                i += 1
            elif ch in _BOND_ORDER:
                pending_order = _BOND_ORDER[ch]
                i += 1
            elif ch.isdigit() or ch == "%":
                if ch == "%":
                    label, i = smiles[i + 1:i + 3], i + 3
                else:
                    label, i = ch, i + 1
                if label in rings:
                    other, order0 = rings.pop(label)
                    add_bond(prev, other, pending_order or order0)
                else:
                    rings[label] = (prev, pending_order)
                pending_order = None
            elif ch == "[":
                atom, i = _parse_bracket(smiles, i + 1)
                atoms.append(atom)
                if prev is not None:
                    add_bond(prev, len(atoms) - 1, pending_order)
                prev = len(atoms) - 1
                pending_order = None
            else:
                sym = None
                for cand in _ORGANIC:
                    if smiles[i:i + len(cand)] == cand:
                        sym = cand
                        break
                if sym is None and ch in _AROMATIC:
                    sym = ch.capitalize()
                    aromatic = True
                elif sym is not None:
                    aromatic = False
                else:
                    raise ValueError(f"unexpected {ch!r} at {i}")
                atoms.append(_Atom(_SYMBOLS[sym], aromatic))
                if prev is not None:
                    add_bond(prev, len(atoms) - 1, pending_order)
                prev = len(atoms) - 1
                pending_order = None
                i += len(sym) if not aromatic else 1
        if rings or stack:
            raise ValueError("unclosed ring bond or branch")
    except (ValueError, IndexError, KeyError):
        return None

    # ring membership: union of cycle-basis nodes on the bond graph
    in_ring = [False] * len(atoms)
    if bonds:
        import networkx as nx

        g = nx.Graph(list(bonds))
        for cyc in nx.cycle_basis(g):
            for v in cyc:
                in_ring[v] = True

    x = np.zeros((len(atoms), X_DIM), np.int32)
    for idx, a in enumerate(atoms):
        order_sum = sum(1 if o == 4 else o for o in a.bonds)
        if a.explicit_h is not None:
            num_h = a.explicit_h
        else:
            cap = next(
                (v for v in _VALENCES.get(a.z, ()) if v >= order_sum), None)
            num_h = 0 if cap is None else cap - order_sum
            if a.aromatic and num_h > 0:
                num_h -= 1  # one valence slot sits in the aromatic system
        x[idx, 0] = a.z
        x[idx, 2] = min(len(a.bonds) + num_h, 10)
        x[idx, 3] = min(max(a.charge + 5, 0), 11)
        x[idx, 4] = min(num_h, 8)
        x[idx, 7] = int(a.aromatic)
        x[idx, 8] = int(in_ring[idx])

    ei, ea = [], []
    for (a, b), order in bonds.items():
        ei += [(a, b), (b, a)]
        ea += [[order, 0, 0]] * 2
    if ei:
        edge_index = np.asarray(ei, np.int32).T
        edge_attr = np.asarray(ea, np.int32)
        perm = np.argsort(
            edge_index[0].astype(np.int64) * len(atoms) + edge_index[1])
        edge_index, edge_attr = edge_index[:, perm], edge_attr[perm]
    else:
        edge_index = np.zeros((2, 0), np.int32)
        edge_attr = np.zeros((0, E_DIM), np.int32)
    return x, edge_index, edge_attr
