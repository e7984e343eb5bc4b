"""Shared fixtures for the per-conv parity tests (reference pattern:
one file per conv, tiny hand-checkable graph — ``test/nn/conv/*``)."""
import numpy as np
import pytest


@pytest.fixture
def small_graph():
    """4-node / 6-edge graph used throughout the reference conv tests
    (``test/nn/conv/test_gcn_conv.py:7``)."""
    senders = np.array([0, 1, 1, 2, 2, 3], np.int32)
    receivers = np.array([1, 0, 2, 1, 3, 2], np.int32)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    return senders, receivers, x


@pytest.fixture
def dense_ahat():
    """Dense Â = D̂^{-1/2}(A+I)D̂^{-1/2} (or no-self-loop variant) matching
    ``ops/norm.gcn_norm`` conventions (deg from receivers, dinv=0 when 0)."""

    def build(s, r, n, add_self_loops=True):
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, s), 1.0)
        deg = A.sum(1) + (1.0 if add_self_loops else 0.0)
        dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
        if add_self_loops:
            A = A + np.eye(n, dtype=np.float32)
        return dinv[:, None] * A * dinv[None, :]

    return build


def dense_adj(senders, receivers, n, weights=None):
    A = np.zeros((n, n), np.float32)
    w = np.ones(len(senders), np.float32) if weights is None else weights
    np.add.at(A, (receivers, senders), w)
    return A
