"""End-to-end stereo test: metric scale recovery via scale optimization."""

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models.full_system import FullSystem, StereoCalib
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
BASELINE = 0.11


@pytest.fixture(scope="module")
def run_stereo():
    calib = synthetic.default_calib(W, H)
    T_lr_world = np.eye(4)
    T_lr_world[0, 3] = BASELINE        # right cam at +x in left frame
    stereo = StereoCalib(
        T_lr=np.asarray(lie.se3_inv(jnp.asarray(T_lr_world, jnp.float32))),
        calib_right=calib,
    )
    settings = default_settings(
        scale_opt_thres=12.0,
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096,
        desired_point_density=400.0, desired_immature_density=400.0,
    )
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    n = 24
    imgs_l, _, poses = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    fs = FullSystem(calib, settings, stereo=stereo)
    for i in range(n):
        T_right = poses[i] @ jnp.asarray(T_lr_world, jnp.float32)
        img_r, _ = synthetic.render_plane(calib, T_right, 2.0)
        fs.add_active_frame(imgs_l[i], timestamp=i * 0.05, frame_id=i,
                            image_right=img_r)
        if fs.is_lost or fs.init_failed:
            break
    return fs, np.asarray(poses)


def test_stereo_runs_and_traps_scale(run_stereo):
    fs, _ = run_stereo
    assert not fs.is_lost and not fs.init_failed
    assert fs.scale_trapped, "scale never trapped"
    kf_scales = [sh.scale for sh in fs.shells if sh.is_kf]
    assert len(kf_scales) >= 3


def test_metric_trajectory(run_stereo):
    """The SCALED trajectory must be metric — no scale alignment allowed."""
    fs, poses_gt = run_stereo
    traj = fs.trajectory(scaled=True)
    ids = traj[:, 0].astype(int)
    est = traj[:, 1:4]
    gt = poses_gt[ids, :3, 3]
    err = np.linalg.norm(est - gt, axis=1)
    ate = np.sqrt(np.mean(err ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.07 * max(path, 1e-9) + 0.01, (ate, path)
