"""Bucketing-policy guarantees (SURVEY §7.3: bound padding waste while
keeping the compiled-shape count O(log max_size))."""
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
    bucket_shape,
)


def test_bucket_count_is_logarithmic():
    shapes = {
        bucket_shape(n, 4 * n) for n in range(1, 200_000, 137)
    }
    # ~1460 distinct inputs collapse to O(log) compiled shapes
    assert len(shapes) <= 16


def test_padding_waste_bounded():
    rng = np.random.default_rng(0)
    worst = 0.0
    wastes = []
    for _ in range(500):
        n = int(rng.integers(1, 100_000))
        e = int(rng.integers(1, 400_000))
        nb, eb = bucket_shape(n, e)
        assert nb > n and eb > e  # ≥1 padding slot guaranteed
        waste = 1 - (n + e) / (nb + eb)
        wastes.append(waste)
        worst = max(worst, waste)
    # hard bound just above 50% (power-of-two buckets), typical ≪ 30%
    assert worst < 0.55
    assert float(np.mean(wastes)) < 0.30


def test_small_graphs_use_minimum_bucket():
    nb, eb = bucket_shape(3, 5)
    assert nb == 128 and eb == 512
