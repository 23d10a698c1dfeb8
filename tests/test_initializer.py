"""Coarse initializer tests: bootstrap pose+depth from a synthetic sequence."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models import initializer as CI
from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

SETTINGS = default_settings()
W, H = 256, 192


def test_initializer_bootstraps():
    calib = synthetic.default_calib(W, H)
    # translation-dominant motion (gives parallax to snap)
    twist = jnp.array([0.045, 0.015, 0.01, 0.002, 0.004, 0.001])
    imgs, idepths, poses = synthetic.make_sequence(calib, 10, twist, plane_z=2.0)
    pyrs = [imops.build_pyramid(imgs[i], calib.levels) for i in range(10)]

    state = CI.set_first(pyrs[0][0], pyrs[0][1], calib, SETTINGS,
                         jax.random.PRNGKey(0))
    n0 = int(jnp.sum(state.levels[0].valid))
    assert n0 > 300, n0

    done = False
    n_frames = 0
    for i in range(1, 10):
        state, done = CI.track_frame(state, pyrs[0][0], pyrs[i][0], calib,
                                     SETTINGS)
        n_frames = i
        if done:
            break

    assert bool(state.snapped), "initializer never snapped"
    assert done, f"not done after {n_frames} frames"

    # pose check: thisToNext = first->current up to scale.
    T_gt = lie.se3_inv(poses[n_frames])    # first -> current (world = first)
    t_est = state.T[:3, 3]
    t_gt = T_gt[:3, 3]
    cos = float(jnp.dot(t_est, t_gt)
                / (jnp.linalg.norm(t_est) * jnp.linalg.norm(t_gt) + 1e-9))
    assert cos > 0.95, cos
    R_err = lie.so3_log(state.T[:3, :3] @ T_gt[:3, :3].T)
    assert float(jnp.linalg.norm(R_err)) < 0.02, R_err

    # structure check: estimated idepth correlates with gt (up to scale)
    lv = state.levels[0]
    good = np.asarray(lv.is_good & lv.valid)
    idt = np.asarray(imops.interp_bilinear(idepths[0], lv.u, lv.v))
    est = np.asarray(lv.idepth)
    ratio = est[good] / idt[good]
    spread = np.std(ratio) / np.mean(ratio)
    assert spread < 0.1, spread


def test_no_motion_does_not_snap():
    calib = synthetic.default_calib(W, H)
    img, _ = synthetic.render_plane(calib, jnp.eye(4))
    pyr = imops.build_pyramid(img, calib.levels)
    state = CI.set_first(pyr[0], pyr[1], calib, SETTINGS, jax.random.PRNGKey(0))
    for _ in range(3):
        state, done = CI.track_frame(state, pyr[0], pyr[0], calib, SETTINGS)
        assert not done
    assert not bool(state.snapped)
