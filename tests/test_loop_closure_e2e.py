"""End-to-end loop closure through the LoopHandler: a drifted trajectory
revisits its start in a structured environment; the Scan-Context match must
fire, ICP must verify, and the pose graph must pull the revisit pose back.

(The direct-photometric verification path is covered by unit tests; records
here carry no pyramids, so the handler escalates to ICP — the reference's
fallback order.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sos_slam_tpu.loop.handler import LoopHandler
from sos_slam_tpu.models.full_system import FrameShell
from sos_slam_tpu.utils import lie
from sos_slam_tpu.utils.config import default_settings

LIDAR_RANGE = 30.0


class RecordingViewer:
    """Minimal MapViewer stand-in recording the loop write-backs."""

    def __init__(self):
        self.edges = []
        self.modified = {}
        self.scans = 0

    def publish_loop_edge(self, a, b):
        self.edges.append((a, b))

    def publish_scan(self, cur, acc):
        self.scans += 1

    def modify_keyframe_pose_by_kf_id(self, kf_id, T):
        self.modified[kf_id] = np.asarray(T).copy()


def make_environment(seed=0, n=1500):
    """Pillars + ground inside a 60m square (camera y is 'up' negative)."""
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(30):
        cx, cz = rng.uniform(-25, 25, 2)
        h = rng.uniform(4, 15)
        for _ in range(30):
            pts.append([cx + rng.randn() * 0.4, -rng.uniform(0, h),
                        cz + rng.randn() * 0.4])
    while len(pts) < n:
        pts.append([rng.uniform(-28, 28), 0.0, rng.uniform(-28, 28)])
    return np.asarray(pts)


def visible_points(env, T_wc, rng):
    """Environment points within range, in camera frame, subsampled."""
    T_cw = np.linalg.inv(T_wc)
    pc = (T_cw[:3, :3] @ env.T).T + T_cw[:3, 3]
    keep = np.linalg.norm(pc, axis=1) < LIDAR_RANGE
    pc = pc[keep]
    idx = rng.choice(len(pc), size=min(1000, len(pc)), replace=False)
    return pc[idx]


@pytest.fixture(scope="module")
def closed_loop():
    # scan_context_thres loosened for sparse synthetic scans (the 0.33
    # default is tuned for dense real KITTI-style scans)
    settings = default_settings(scale_opt_thres=12.0, loop_lidar_range=LIDAR_RANGE,
                                loop_icp_thres=1.0, scan_context_thres=0.42)
    lh = LoopHandler(settings, intrinsics=((300.0, 300.0, 128.0, 96.0),),
                     n_levels=1, ringkey_margin=6)
    lh.attach_viewer(RecordingViewer())
    env = make_environment()
    rng = np.random.RandomState(42)

    # closed 16-gon, continued 3 segments past closure so the revisit
    # matches KFs 1..3 (index 0 is excluded by the ringkey search rule)
    n = 20
    gt = [np.eye(4)]
    seg = np.asarray(lie.se3_exp(jnp.asarray(
        [2.0, 0.0, 0.0, 0.0, 2 * np.pi / 16, 0.0], jnp.float32)))
    for _ in range(1, n):
        gt.append(gt[-1] @ seg)
    gt = np.stack(gt)

    # odometry drift accumulating per KF
    drift = np.asarray(lie.se3_exp(jnp.asarray(
        [0.06, 0.03, -0.04, 0.004, 0.006, 0.0], jnp.float32)))
    odo = [np.eye(4)]
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        odo.append(odo[-1] @ rel @ drift)
    odo = np.stack(odo)

    for i in range(n):
        shell = FrameShell(id=i, timestamp=i * 0.5,
                           cam_to_world=odo[i].copy(), aff=np.zeros(2))
        shell.cam_to_world_scaled = odo[i].copy()
        # points observed from the TRUE pose (the world is what it is)
        pts_cam = visible_points(env, gt[i], rng)
        # hand the handler camera-frame [u,v,idepth]-equivalent: it converts
        # from pts_uvdi, so pre-invert that mapping with a pinhole
        fx, fy, cx, cy = lh.intrinsics[0]
        z = pts_cam[:, 2]
        ok = z > 0.5
        pts_cam = pts_cam[ok]
        pts_uvdi = np.stack([
            pts_cam[:, 0] / pts_cam[:, 2] * fx + cx,
            pts_cam[:, 1] / pts_cam[:, 2] * fy + cy,
            1.0 / pts_cam[:, 2]], -1)
        lh.on_keyframe(dict(shell=shell, pts_uvdi=pts_uvdi,
                            intensities=np.zeros((len(pts_uvdi), 1),
                                                 np.float32),
                            pyramid=None, dso_error=1.0, scale_error=2.0))
    lh.join()     # drain the async loop worker before inspecting state
    return lh, gt, odo


def test_loop_edge_found(closed_loop):
    lh, gt, odo = closed_loop
    assert lh.n_loop_edges >= 1, "no loop closure fired"
    assert lh.n_icp >= 1


def test_viewer_write_back(closed_loop):
    """After a closure the optimized poses must be pushed to the viewer
    (modifyKeyframePoseByKFID, LoopHandler.cpp:352-372) along with the
    loop-edge line and the merged scan panel."""
    lh, gt, odo = closed_loop
    v = lh.viewers[0]
    assert len(v.edges) == lh.n_loop_edges >= 1
    assert v.scans >= 1
    assert len(v.modified) == len(lh.frames)
    for f in lh.frames:
        np.testing.assert_allclose(v.modified[f["kf_id"]], f["T_opt"],
                                   atol=1e-9)


def test_drift_corrected(closed_loop):
    lh, gt, odo = closed_loop
    traj = lh.trajectory()
    # end-point error vs ground truth before and after
    err_before = np.linalg.norm(odo[-1][:3, 3] - gt[-1][:3, 3])
    err_after = np.linalg.norm(traj[-1, 1:4] - gt[-1][:3, 3])
    # the newest vertex is FIXED (reference semantics) — drift is instead
    # redistributed; measure total trajectory error instead
    gt_xyz = gt[traj[:, 0].astype(int), :3, 3]
    e_odo = np.linalg.norm(odo[traj[:, 0].astype(int), :3, 3] - gt_xyz, axis=1)
    e_opt = np.linalg.norm(traj[:, 1:4] - gt_xyz, axis=1)
    # rigid-align both (the fixed newest vertex shifts the gauge)
    from sos_slam_tpu.utils.evaluate import ate_rmse
    r_odo = ate_rmse(odo[traj[:, 0].astype(int), :3, 3], gt_xyz)["rmse"]
    r_opt = ate_rmse(traj[:, 1:4], gt_xyz)["rmse"]
    assert r_opt < 0.6 * r_odo, (r_odo, r_opt)
