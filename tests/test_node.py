"""SlamNode-level tests: reinitialization and publisher wrappers."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.io.node import SlamNode
from sos_slam_tpu.io.output_wrapper import Output3DWrapper
from sos_slam_tpu.loop import scancontext as SC
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192


def small_settings(**kw):
    return default_settings(
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096, desired_point_density=400.0,
        desired_immature_density=400.0, **kw)


def make_node():
    tmp = tempfile.mkdtemp()
    calib_file = os.path.join(tmp, "camera0.txt")
    with open(calib_file, "w") as f:
        f.write("Pinhole 179.2 179.2 127.5 95.5 0\n256 192\nnone\n256 192\n")
    return SlamNode(small_settings(), calib_file)


class CountingWrapper(Output3DWrapper):
    def __init__(self):
        self.poses = 0
        self.kfs = 0
        self.finals = 0
        self.depths = 0

    def publish_cam_pose(self, shell, calib):
        self.poses += 1

    def publish_keyframes(self, record, final):
        if final:
            self.finals += 1
        else:
            self.kfs += 1

    def push_depth_image(self, image, idepth):
        self.depths += 1
        assert image.shape == idepth.shape


def test_reinitialization_preserves_history():
    node = make_node()
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    n = 34
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    # long enough for the window to fill and marginalization to start
    for i in range(16):
        node.process(np.asarray(imgs[i]), i * 0.05)
    kfs_before = node.fs.stats["n_kf"]
    assert kfs_before > 2
    loop_before = len(node.loop.frames)
    pose_at_failure = np.asarray(node.cur_pose).copy()
    # force an initialization failure (the reference's rmse-gate outcome)
    node.fs.init_failed = True
    node.process(np.asarray(imgs[16]), 16 * 0.05)
    # KF count carried over (>=: the triggering frame may add one last KF)
    assert node.prev_kf_size >= kfs_before
    assert not node.fs.initialized                # fresh system
    # keeps running with the fresh system
    for i in range(17, n):
        node.process(np.asarray(imgs[i]), i * 0.05)
    assert node.n_frames == n
    # loop handler history was NOT cleared by the restart
    assert len(node.loop.frames) >= loop_before
    # trajectory continuity: the rebuilt system's first keyframe resumes at
    # the pre-failure pose instead of teleporting to the origin
    # (SlamNode.cpp:174-189 curPose carry + FullSystem.cpp:1040-1042)
    assert node.fs.initialized, "fresh system failed to re-initialize"
    first_kf = next(sh for sh in node.fs.shells if sh.is_kf)
    np.testing.assert_allclose(first_kf.cam_to_world, pose_at_failure,
                               atol=1e-5)


def test_output_wrappers_receive_events():
    node = make_node()
    cw = CountingWrapper()
    node.extra_wrappers.append(cw)
    node.fs.output_wrappers.append(cw)
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    n = 22   # enough frames to fill the window and marginalize
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    for i in range(n):
        node.process(np.asarray(imgs[i]), i * 0.05)
    assert cw.poses > 0
    assert cw.kfs >= 2
    assert cw.depths == cw.kfs
    assert cw.finals >= 1
    assert len(node.pose_recorder.current) == cw.poses
    assert len(node.pose_recorder.marginalized) == cw.finals


def test_downward_scan_mode():
    rng = np.random.RandomState(3)
    pts = np.concatenate([
        rng.uniform(-10, 10, (400, 3)) * np.array([1, 1, 0.05]) +
        np.array([0, 0, 5.0]),           # ground plane 5m below (cam +z down)
        rng.uniform(-3, 3, (100, 3)) * np.array([1, 1, 1]) +
        np.array([2, 1, 3.0]),           # a structure
    ])
    T_wc = np.eye(4)
    scan, T_sc = SC.process_scan_downward(T_wc, pts, 15.0, enable_imu=False)
    assert scan.shape[0] > 100
    sig, rk, ok = SC.generate(scan, T_sc, 15.0)
    assert np.isfinite(sig).all()
