"""Evaluation utility tests."""

import pytest
import numpy as np

from sos_slam_tpu.utils.evaluate import associate_by_time, ate_rmse, umeyama

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke



def test_umeyama_exact():
    rng = np.random.RandomState(0)
    src = rng.randn(50, 3)
    R_gt, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(R_gt) < 0:
        R_gt[:, 0] *= -1
    t_gt = np.array([1.0, -2.0, 0.5])
    s_gt = 2.5
    dst = (s_gt * (R_gt @ src.T)).T + t_gt
    R, t, s = umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_gt, rtol=1e-6)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    stats = ate_rmse(src, dst, align_scale=True)
    assert stats["rmse"] < 1e-6


def test_ate_se3_only():
    rng = np.random.RandomState(1)
    src = rng.randn(30, 3)
    dst = src * 2.0   # scale mismatch must show up without scale alignment
    assert ate_rmse(src, dst, align_scale=False)["rmse"] > 0.5
    assert ate_rmse(src, dst, align_scale=True)["rmse"] < 1e-6


def test_associate_by_time():
    t1 = np.array([0.0, 0.1, 0.2, 0.35])
    x1 = np.arange(4)[:, None] * np.ones(3)
    t2 = np.array([0.001, 0.099, 0.26, 0.349])
    x2 = x1 + 0.5
    a, b = associate_by_time(t1, x1, t2, x2, max_dt=0.02)
    assert len(a) == 3   # 0.2 has no partner within 20ms
