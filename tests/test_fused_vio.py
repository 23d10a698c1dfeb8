"""Fused VIO per-frame dispatch (_kf_chain_vio_jit): once the IMU is
initialized (5th KF) the whole visual-inertial keyframe chain — IMU-sample
intake, spline propagation, activation, the KKT BA, scale trapping (or the
in-chain stereo solve), VIO point/frame marginalization, new-trace
selection — runs cond-gated behind the frame step with ONE readback per
frame, like the mono/stereo chain. Must reproduce the classic host-decided
VIO path (same accepted divergences as test_fused_kf: device-f32 keyframe
decisions can flip at threshold edges).

Reference semantics: FullSystem::makeKeyFrame (FullSystem.cpp:820-1000),
setImuData/propagateImuState (HessianBlocks.cpp:300-404),
optimizeScale (FullSystem.cpp:1117-1180)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models.full_system import FullSystem, StereoCalib
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
FRAME_DT = 0.1
IMU_HZ = 200.0
PLANE_Z = 2.0
N_FRAMES = 20
BASELINE = 0.11

# cubic trajectory (see test_vio_system.py for the excitation rationale)
L = np.array([0.10, 0.05, 0.08, 0.04, 0.06, 0.03])
Q = np.array([0.06, -0.05, 0.04, 0.02, -0.015, 0.02])
C = np.array([0.008, -0.006, 0.007, -0.004, 0.003, -0.004])
BIAS_G = np.array([0.005, -0.008, 0.006])


def pose_at(t):
    p = L[:3] * t + Q[:3] * t * t + C[:3] * t ** 3
    r = L[3:] * t + Q[3:] * t * t + C[3:] * t ** 3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(r, jnp.float32)))
    T[:3, 3] = p
    return T


def imu_between(t0, t1):
    g_world = np.array([0.0, 0.0, -9.81])
    out = []
    n = int(round((t1 - t0) * IMU_HZ))
    h = 1e-4
    for i in range(1, n + 1):
        t = t0 + i / IMU_HZ
        T = pose_at(t)
        R = T[:3, :3]
        a_w = 2 * Q[:3] + 6 * C[:3] * t
        Rp = pose_at(t + h)[:3, :3]
        Rm = pose_at(t - h)[:3, :3]
        Wx = R.T @ ((Rp - Rm) / (2 * h))
        w_body = np.array([Wx[2, 1], Wx[0, 2], Wx[1, 0]])
        acc = R.T @ (a_w + g_world)
        out.append((t, acc.astype(np.float32),
                    (w_body + BIAS_G).astype(np.float32)))
    return out


def _settings(**kw):
    return default_settings(
        weight_imu_dso=6.0,
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096,
        desired_point_density=400.0, desired_immature_density=400.0,
        min_g_imu=10, **kw)


def _run_vio(fused: bool, stereo: bool = False, pipeline: bool = True):
    calib = synthetic.default_calib(W, H)
    st = None
    T_lr_world = np.eye(4)
    if stereo:
        T_lr_world[0, 3] = BASELINE
        st = StereoCalib(
            T_lr=np.asarray(
                lie.se3_inv(jnp.asarray(T_lr_world, jnp.float32))),
            calib_right=calib)
    settings = _settings(scale_opt_thres=12.0) if stereo else _settings()
    poses = [pose_at(i * FRAME_DT) for i in range(N_FRAMES)]
    fs = FullSystem(calib, settings, stereo=st)
    fs.fused_kf = fused
    fs.pipeline = pipeline
    t_prev = -FRAME_DT
    for i in range(N_FRAMES):
        t = i * FRAME_DT
        img = synthetic.render_plane(calib, jnp.asarray(poses[i]),
                                     PLANE_Z)[0]
        img_r = None
        if stereo:
            T_right = jnp.asarray(poses[i] @ T_lr_world, jnp.float32)
            img_r, _ = synthetic.render_plane(calib, T_right, PLANE_Z)
        fs.add_active_frame(img, timestamp=t, frame_id=i,
                            imu_samples=imu_between(t_prev, t),
                            image_right=img_r)
        t_prev = t
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    return fs, np.stack(poses)


@pytest.fixture(scope="module")
def vio_pair():
    fs_c, poses = _run_vio(fused=False)
    fs_f, _ = _run_vio(fused=True)
    return fs_c, fs_f, poses


def test_fused_vio_matches_classic(vio_pair):
    fs_c, fs_f, _ = vio_pair
    assert not fs_f.is_lost and not fs_f.init_failed
    assert fs_f.imu_initialized
    # the fused completion is the only writer of the host bias cache —
    # proof the VIO chain path actually ran (no silent classic fallback)
    assert fs_f._last_bg is not None

    traj_c = fs_c.trajectory()
    traj_f = fs_f.trajectory()
    ids_c = traj_c[:, 0].astype(int).tolist()
    ids_f = traj_f[:, 0].astype(int).tolist()
    assert abs(len(ids_c) - len(ids_f)) <= 2, (ids_c, ids_f)
    common = sorted(set(ids_c) & set(ids_f))
    assert len(common) >= min(len(ids_c), len(ids_f)) - 2
    pc = {int(r[0]): r[1:4] for r in traj_c}
    pf = {int(r[0]): r[1:4] for r in traj_f}
    d = np.array([np.linalg.norm(pc[i] - pf[i]) for i in common])
    assert d.max() < 2e-3, d.max()

    # metric scale agrees between the two drivers
    from sos_slam_tpu.models import imu as IM
    s_c = float(fs_c.imu.scale) * IM.SCALE_SCALE
    s_f = float(fs_f.imu.scale) * IM.SCALE_SCALE
    assert abs(s_c - s_f) / s_c < 0.05, (s_c, s_f)


def test_fused_vio_metric_trajectory(vio_pair):
    _, fs_f, poses_gt = vio_pair
    traj = fs_f.trajectory(scaled=True)
    ids = traj[:, 0].astype(int)
    est = traj[:, 1:4]
    gt = poses_gt[ids, :3, 3]
    err = np.linalg.norm(est - gt, axis=1)
    ate = np.sqrt(np.mean(err ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.15 * max(path, 1e-9) + 0.03, (ate, path)


def test_pipelined_vio_bitwise_matches_sync(vio_pair):
    """Pipelining only changes WHEN readbacks happen: the depth-N pipelined
    fused VIO driver consumes bit-identical chained device values (staged
    IMU blocks masked by the chained last-KF timestamp), so trajectories,
    keyframe sets and window state must match the sync fused driver
    exactly."""
    _, fs_p, _ = vio_pair                      # pipeline=True (default)
    fs_s, _ = _run_vio(fused=True, pipeline=False)
    assert not fs_s.is_lost and not fs_s.init_failed

    traj_s, traj_p = fs_s.trajectory(), fs_p.trajectory()
    assert traj_s[:, 0].astype(int).tolist() == \
        traj_p[:, 0].astype(int).tolist(), "keyframe sets differ"
    np.testing.assert_array_equal(traj_s[:, 1:4], traj_p[:, 1:4])
    np.testing.assert_array_equal(np.asarray(fs_s.ba.state),
                                  np.asarray(fs_p.ba.state))
    np.testing.assert_array_equal(np.asarray(fs_s.imu.state),
                                  np.asarray(fs_p.imu.state))


def test_fused_stereo_vio_full_config():
    """The flagship configuration (stereo + VIO): the fused chain runs the
    in-chain stereo scale solve and the KKT BA; the SCALED trajectory must
    be metric with no alignment."""
    fs, poses_gt = _run_vio(fused=True, stereo=True)
    assert not fs.is_lost and not fs.init_failed
    assert fs.imu_initialized
    assert fs._last_bg is not None      # fused VIO chain ran
    assert fs.scale_trapped, "stereo scale never trapped"

    traj = fs.trajectory(scaled=True)
    ids = traj[:, 0].astype(int)
    est = traj[:, 1:4]
    gt = poses_gt[ids, :3, 3]
    err = np.linalg.norm(est - gt, axis=1)
    ate = np.sqrt(np.mean(err ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.15 * max(path, 1e-9) + 0.03, (ate, path)
