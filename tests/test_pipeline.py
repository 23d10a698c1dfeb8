"""1-deep pipelining of the fused driver (FullSystem.pipeline).

Sync and pipelined modes consume bit-identical chained device values (the
keyframe chain emits the complete next-frame dispatch state); pipelining
only changes WHEN the host reads results back, never what the device
computes — so the trajectories and keyframe sets must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
N_FRAMES = 28


def _settings():
    return default_settings(
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096, desired_point_density=400.0,
        desired_immature_density=400.0,
    )


def _run(pipeline: bool):
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    imgs, _, poses = synthetic.make_sequence(calib, N_FRAMES, twist,
                                             plane_z=2.0)
    fs = FullSystem(calib, _settings())
    fs.pipeline = pipeline
    for i in range(N_FRAMES):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    return fs, np.asarray(poses)


def test_pipelined_bitwise_matches_sync():
    fs_s, poses = _run(pipeline=False)
    fs_p, _ = _run(pipeline=True)
    assert not fs_p.is_lost and not fs_p.init_failed
    assert fs_p.initialized

    traj_s = fs_s.trajectory()
    traj_p = fs_p.trajectory()
    assert traj_s[:, 0].astype(int).tolist() == \
        traj_p[:, 0].astype(int).tolist(), "keyframe sets differ"
    np.testing.assert_array_equal(traj_s[:, 1:4], traj_p[:, 1:4])
    np.testing.assert_array_equal(np.asarray(fs_s.ba.state),
                                  np.asarray(fs_p.ba.state))
    np.testing.assert_array_equal(np.asarray(fs_s.ba.pt_valid),
                                  np.asarray(fs_p.ba.pt_valid))


def test_pipelined_accuracy():
    fs_p, poses = _run(pipeline=True)
    traj = fs_p.trajectory()
    ids = traj[:, 0].astype(int)
    est, gt = traj[:, 1:4], poses[ids, :3, 3]
    en, gn = np.linalg.norm(est, axis=1), np.linalg.norm(gt, axis=1)
    nz = gn > 1e-6
    scale = np.median(en[nz] / gn[nz]) if nz.any() else 1.0
    ate = np.sqrt(np.mean(
        np.linalg.norm(est / max(scale, 1e-9) - gt, axis=1) ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.05 * max(path, 1e-9) + 0.01, (ate, path)
