"""Fréchet distance math (reference tests/training_utils/test_metrics.py
requires DINOv2 weights; here the statistic itself is validated)."""

import numpy as np

from refiners_tpu.training_utils.metrics import frechet_distance


def test_frechet_distance_identity_is_zero() -> None:
    rs = np.random.RandomState(0)
    reps = rs.randn(256, 16).astype(np.float64)
    assert abs(frechet_distance(reps, reps.copy())) < 1e-8


def test_frechet_distance_matches_closed_form_gaussians() -> None:
    # For two Gaussians the FD is |mu1-mu2|^2 + tr(C1 + C2 - 2 sqrt(C1 C2));
    # with diagonal covariances this is a hand-computable sum.
    rs = np.random.RandomState(1)
    n, d = 200_000, 4
    mean_a = np.zeros(d)
    mean_b = np.asarray([1.0, 0.0, -1.0, 2.0])
    std_a = np.asarray([1.0, 2.0, 1.0, 0.5])
    std_b = np.asarray([1.5, 1.0, 1.0, 1.0])
    a = rs.randn(n, d) * std_a + mean_a
    b = rs.randn(n, d) * std_b + mean_b
    expected = float(((mean_a - mean_b) ** 2).sum() + ((std_a - std_b) ** 2).sum())
    got = frechet_distance(a, b)
    assert abs(got - expected) < 0.05, (got, expected)


def test_frechet_distance_symmetry() -> None:
    rs = np.random.RandomState(2)
    a = rs.randn(500, 8)
    b = rs.randn(500, 8) + 0.3
    assert abs(frechet_distance(a, b) - frechet_distance(b, a)) < 1e-6
