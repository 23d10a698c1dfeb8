"""Checkpoint/resume: a resumed system continues tracking identically-well."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models import snapshot as SNAP
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192


def small_settings():
    return default_settings(
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096, desired_point_density=400.0,
        desired_immature_density=400.0)


def test_snapshot_roundtrip_and_resume():
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    n = 18
    imgs, _, poses = synthetic.make_sequence(calib, n, twist, plane_z=2.0)

    fs = FullSystem(calib, small_settings())
    for i in range(12):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    assert fs.initialized and not fs.is_lost

    path = os.path.join(tempfile.mkdtemp(), "state.npz")
    SNAP.save_snapshot(fs, path)

    fs2 = FullSystem(calib, small_settings())
    SNAP.load_snapshot(fs2, path)
    assert fs2.initialized
    assert fs2.stats["n_kf"] == fs.stats["n_kf"]
    assert int(jnp.sum(fs2.ba.pt_valid)) == int(jnp.sum(fs.ba.pt_valid))

    # both continue; the resumed one must track the remaining frames fine
    for i in range(12, n):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        fs2.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    assert not fs2.is_lost
    t1 = fs.trajectory()
    t2 = fs2.trajectory()
    assert t1.shape == t2.shape
    np.testing.assert_allclose(t1, t2, atol=5e-3)
