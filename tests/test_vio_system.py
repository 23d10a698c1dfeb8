"""End-to-end mono+IMU (spline VIO) test: metric scale from inertial data.

The camera follows a CUBIC trajectory (p(t), r(t) cubic in t) so body-frame
acceleration varies over time — constant-twist motion would make the metric
scale degenerate with the accelerometer bias. IMU measurements follow the
reference's model: acc = R_imu<-world (a_w + setting_gravity) + ba.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
FRAME_DT = 0.1
IMU_HZ = 200.0
PLANE_Z = 2.0
N_FRAMES = 20

# cubic trajectory coefficients: p = L t + Q t^2 + C t^3 (world, meters);
# rotation log r(t) likewise (world <- cam). C has the same sign as Q so the
# acceleration 2Q + 6Ct stays well away from zero over the whole run (scale
# would be unobservable through an acceleration zero crossing).
L = np.array([0.10, 0.05, 0.08, 0.04, 0.06, 0.03])
Q = np.array([0.06, -0.05, 0.04, 0.02, -0.015, 0.02])
C = np.array([0.008, -0.006, 0.007, -0.004, 0.003, -0.004])


def pose_at(t):
    p = L[:3] * t + Q[:3] * t * t + C[:3] * t ** 3
    r = L[3:] * t + Q[3:] * t * t + C[3:] * t ** 3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(r, jnp.float32)))
    T[:3, 3] = p
    return T


def imu_between(t0, t1, bias_g=np.zeros(3)):
    g_world = np.array([0.0, 0.0, -9.81])
    out = []
    n = int(round((t1 - t0) * IMU_HZ))
    h = 1e-4
    for i in range(1, n + 1):
        t = t0 + i / IMU_HZ
        T = pose_at(t)
        R = T[:3, :3]
        a_w = 2 * Q[:3] + 6 * C[:3] * t
        # body rates from R^T dR/dt (central difference on the analytic R)
        Rp = pose_at(t + h)[:3, :3]
        Rm = pose_at(t - h)[:3, :3]
        Wx = R.T @ ((Rp - Rm) / (2 * h))
        w_body = np.array([Wx[2, 1], Wx[0, 2], Wx[1, 0]])
        acc = R.T @ (a_w + g_world)
        out.append((t, acc.astype(np.float32),
                    (w_body + bias_g).astype(np.float32)))
    return out


@pytest.fixture(scope="module")
def run_vio():
    calib = synthetic.default_calib(W, H)
    settings = default_settings(
        weight_imu_dso=6.0,
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096,
        desired_point_density=400.0, desired_immature_density=400.0,
        min_g_imu=10,
    )
    poses = [pose_at(i * FRAME_DT) for i in range(N_FRAMES)]
    imgs = [synthetic.render_plane(calib, jnp.asarray(p), PLANE_Z)[0]
            for p in poses]
    bias_g = np.array([0.005, -0.008, 0.006])

    fs = FullSystem(calib, settings)
    t_prev = -FRAME_DT
    for i in range(N_FRAMES):
        t = i * FRAME_DT
        fs.add_active_frame(imgs[i], timestamp=t, frame_id=i,
                            imu_samples=imu_between(t_prev, t, bias_g))
        t_prev = t
        if fs.is_lost or fs.init_failed:
            break
    return fs, np.stack(poses), bias_g


def test_vio_runs_and_initializes(run_vio):
    fs, _, _ = run_vio
    assert not fs.is_lost, "lost"
    assert not fs.init_failed, "init failed"
    assert fs.imu_initialized, "imu never initialized"


def test_metric_scale_from_imu(run_vio):
    fs, poses_gt, _ = run_vio
    from sos_slam_tpu.models import imu as IM
    s = float(fs.imu.scale) * IM.SCALE_SCALE
    traj = fs.trajectory()
    ids = traj[:, 0].astype(int)
    est = traj[:, 1:4]
    gt = poses_gt[ids, :3, 3]
    en = np.linalg.norm(est, axis=1)
    gn = np.linalg.norm(gt, axis=1)
    nz = gn > 1e-6
    s_true = np.median(gn[nz] / en[nz])
    # e2e scale accuracy is excitation-limited on this gentle trajectory
    # (accelerations ~0.1-0.3 m/s^2 let scale trade off against the
    # accelerometer-bias random walk — same behavior as the reference);
    # the tight 2% gate lives at the solver level on model-consistent
    # data (test_imu.py::TestSolve::test_scale_recovered_within_2pct)
    assert abs(s - s_true) / s_true < 0.12, (s, s_true)


def test_metric_trajectory_vio(run_vio):
    fs, poses_gt, _ = run_vio
    traj = fs.trajectory(scaled=True)
    ids = traj[:, 0].astype(int)
    est = traj[:, 1:4]
    gt = poses_gt[ids, :3, 3]
    err = np.linalg.norm(est - gt, axis=1)
    ate = np.sqrt(np.mean(err ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.15 * max(path, 1e-9) + 0.03, (ate, path)


def test_gyro_bias_estimated(run_vio):
    fs, _, bias_g = run_vio
    from sos_slam_tpu.models import imu as IM
    newest = int(jnp.sum(fs.ba.frame_valid)) - 1
    bg = np.asarray(fs.imu.state[newest] * np.asarray(IM.IMU_SCALE21))[3:6]
    assert np.linalg.norm(bg - bias_g) < 0.03, (bg, bias_g)
