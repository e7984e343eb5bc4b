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


def dense_adj(senders, receivers, n, weights=None):
    A = np.zeros((n, n), np.float32)
    w = np.ones(len(senders), np.float32) if weights is None else weights
    np.add.at(A, (receivers, senders), w)
    return A
