"""LoopHandler integrated with the stereo FullSystem: odometry edges,
scan assembly, poses.txt output."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.loop.handler import LoopHandler
from sos_slam_tpu.models.full_system import FullSystem, StereoCalib
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
BASELINE = 0.11


@pytest.fixture(scope="module")
def run_with_loop(tmp_path_factory):
    calib = synthetic.default_calib(W, H)
    T_lr_world = np.eye(4)
    T_lr_world[0, 3] = BASELINE
    stereo = StereoCalib(
        T_lr=np.asarray(lie.se3_inv(jnp.asarray(T_lr_world, jnp.float32))),
        calib_right=calib)
    settings = default_settings(
        scale_opt_thres=12.0, loop_lidar_range=40.0,
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096,
        desired_point_density=400.0, desired_immature_density=400.0)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    n = 24
    imgs_l, _, poses = synthetic.make_sequence(calib, n, twist, plane_z=2.0)

    fs = FullSystem(calib, settings, stereo=stereo)
    intr = tuple(calib.intrinsics(l) for l in range(calib.levels))
    lh = LoopHandler(settings, intr, calib.levels)
    fs.marg_callbacks.append(lh.on_keyframe)

    for i in range(n):
        T_right = poses[i] @ jnp.asarray(T_lr_world, jnp.float32)
        img_r, _ = synthetic.render_plane(calib, T_right, 2.0)
        fs.add_active_frame(imgs_l[i], timestamp=i * 0.05, frame_id=i,
                            image_right=img_r)
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    lh.join()     # drain the async loop worker before inspecting state
    return fs, lh, np.asarray(poses)


def test_handler_receives_marginalized_kfs(run_with_loop):
    fs, lh, _ = run_with_loop
    assert not fs.is_lost and not fs.init_failed
    assert len(lh.frames) >= 3, len(lh.frames)
    # odometry edges link consecutive frames
    n_edges = sum(len(f["edges"]) for f in lh.frames)
    assert n_edges >= len(lh.frames) - 1


def test_scan_context_built(run_with_loop):
    fs, lh, _ = run_with_loop
    with_scan = [f for f in lh.frames if f["pts_sc"].shape[0] > 0]
    assert len(with_scan) >= 1, "no scans assembled"


def test_poses_txt(run_with_loop, tmp_path):
    fs, lh, poses_gt = run_with_loop
    path = os.path.join(tmp_path, "poses.txt")
    lh.save_poses(path)
    data = np.loadtxt(path)
    assert data.ndim == 2 and data.shape[1] == 4
    # metric positions close to gt for the marginalized KFs
    ids = data[:, 0].astype(int)
    err = np.linalg.norm(data[:, 1:4] - poses_gt[ids, :3, 3], axis=1)
    assert np.sqrt((err ** 2).mean()) < 0.15, err
