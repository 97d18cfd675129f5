"""Tests for ADD metrics and VOCap AUC (scoreboard numerics)."""

import numpy as np
import pytest

from morefusion_tpu import metrics


def test_average_distance_identity(rng):
    points = rng.uniform(-0.05, 0.05, (100, 3))
    T = np.eye(4)
    adds, add_ss = metrics.average_distance([points], [T], [T])
    assert adds[0] == pytest.approx(0.0, abs=1e-9)
    assert add_ss[0] == pytest.approx(0.0, abs=1e-9)


def test_average_distance_pure_translation(rng):
    points = rng.uniform(-0.05, 0.05, (100, 3))
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, 3] = [0.03, 0.0, 0.0]
    adds, add_ss = metrics.average_distance([points], [T1], [T2])
    assert adds[0] == pytest.approx(0.03, abs=1e-9)
    assert add_ss[0] <= adds[0] + 1e-12


def test_ycb_video_add_auc_all_zero_errors():
    assert metrics.ycb_video_add_auc(np.zeros(100)) == pytest.approx(1.0)


def test_ycb_video_add_auc_all_over_threshold():
    assert metrics.ycb_video_add_auc(np.full(100, 0.5)) == 0


def test_ycb_video_add_auc_reference_values():
    """VOCap formula spot-checks: uniform errors in [0, 0.1] -> AUC ~ 0.5."""
    errors = np.linspace(0, 0.0999, 1000)
    auc = metrics.ycb_video_add_auc(errors)
    assert auc == pytest.approx(0.5, abs=0.01)

    # Half perfect, half failed: step function at accuracy 0.5.
    errors = np.r_[np.zeros(50), np.full(50, 1.0)]
    auc = metrics.ycb_video_add_auc(errors)
    assert auc == pytest.approx(0.5, abs=0.01)


def test_auc_for_errors_matches_ycb_shape():
    errors = np.random.RandomState(0).uniform(0, 0.2, 500)
    auc1 = metrics.auc_for_errors(errors, max_threshold=0.1)
    auc2 = metrics.ycb_video_add_auc(errors)
    assert auc1 == pytest.approx(auc2, abs=0.02)
