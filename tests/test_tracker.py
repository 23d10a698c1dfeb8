"""Coarse tracker tests on the synthetic plane scene."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.ops import tracker
from sos_slam_tpu.utils import lie, synthetic

KEY = jax.random.PRNGKey(0)
W, H = 320, 240


def make_scene(twist, plane_z=2.0):
    calib = synthetic.default_calib(W, H)
    T_ref = jnp.eye(4)
    T_new = lie.se3_exp(jnp.array(twist, jnp.float32))  # cam-to-world
    img_ref, idepth_ref = synthetic.render_plane(calib, T_ref, plane_z)
    img_new, _ = synthetic.render_plane(calib, T_new, plane_z)
    T_ref_to_new_gt = lie.se3_inv(T_new)  # @ T_ref = I
    return calib, img_ref, idepth_ref, img_new, T_ref_to_new_gt


def make_templates(calib, img_ref, idepth_ref, n_levels, stride=4):
    """Grid-sampled semi-dense template at every level (test stand-in for
    makeCoarseDepthL0)."""
    levels, _ = imops.build_pyramid(img_ref, n_levels)
    idp = idepth_ref
    tmpls = []
    for lvl in range(n_levels):
        h, w = levels[lvl].shape[:2]
        s = max(stride >> lvl, 1)
        vv, uu = jnp.meshgrid(
            jnp.arange(3, h - 3, s, dtype=jnp.float32),
            jnp.arange(3, w - 3, s, dtype=jnp.float32),
            indexing="ij",
        )
        u = uu.reshape(-1)
        v = vv.reshape(-1)
        color = imops.interp_bilinear(levels[lvl][..., 0], u, v)
        idl = imops.interp_bilinear(idp, u, v)
        tmpls.append(
            tracker.LevelTemplate(
                u=u, v=v, idepth=idl, color=color,
                valid=jnp.ones_like(u, dtype=bool),
            )
        )
        if lvl + 1 < n_levels:
            idp = imops.downsample2x(idp)
    return tmpls


def run_track(twist, T_init=None):
    calib, img_ref, idepth_ref, img_new, T_gt = make_scene(twist)
    n_levels = calib.levels
    tmpls = make_templates(calib, img_ref, idepth_ref, n_levels)
    pyr_new, _ = imops.build_pyramid(img_new, n_levels)
    intr = tuple(calib.intrinsics(l) for l in range(n_levels))
    out = tracker.track_newest_coarse(
        pyr_new, tuple(tmpls),
        jnp.eye(4) if T_init is None else T_init,
        jnp.zeros(2), jnp.zeros(2), jnp.ones(2),
        jnp.full((6,), jnp.nan), intr, n_levels,
    )
    return out, T_gt


class TestTrackLevel:
    def test_zero_motion_zero_residual(self):
        out, T_gt = run_track([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        assert bool(out["good"])
        assert float(out["residuals"][0]) < 1.0  # sub-intensity rms
        err = lie.se3_log(out["T"] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 1e-3

    def test_small_translation(self):
        out, T_gt = run_track([0.02, 0.01, 0.03, 0.0, 0.0, 0.0])
        assert bool(out["good"])
        err = lie.se3_log(out["T"] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 5e-3, err

    def test_rotation_and_translation(self):
        out, T_gt = run_track([0.01, -0.02, 0.02, 0.01, 0.015, -0.01])
        assert bool(out["good"])
        err = lie.se3_log(out["T"] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 5e-3, err

    def test_moderate_motion_converges(self):
        out, T_gt = run_track([0.05, 0.02, 0.05, 0.02, 0.03, 0.01])
        assert bool(out["good"])
        err = lie.se3_log(out["T"] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 1e-2, err

    def test_residual_decreases(self):
        """Final rms must be far below the initial photometric error."""
        out, _ = run_track([0.03, 0.0, 0.02, 0.0, 0.01, 0.0])
        assert float(out["residuals"][0]) < 3.0


class TestHypotheses:
    def test_batched_matches_single(self):
        calib, img_ref, idepth_ref, img_new, T_gt = make_scene(
            [0.02, 0.01, 0.02, 0.005, 0.01, 0.0]
        )
        n_levels = calib.levels
        tmpls = tuple(make_templates(calib, img_ref, idepth_ref, n_levels))
        pyr_new, _ = imops.build_pyramid(img_new, n_levels)
        intr = tuple(calib.intrinsics(l) for l in range(n_levels))
        # 4 hypotheses: identity, gt, and two perturbed
        Ts = jnp.stack([
            jnp.eye(4), T_gt,
            lie.se3_exp(jnp.array([0.1, 0, 0, 0, 0, 0])),
            lie.se3_exp(jnp.array([0, 0, 0, 0.05, 0, 0])),
        ])
        outs = tracker.track_hypotheses(
            pyr_new, tmpls, Ts, jnp.zeros(2), jnp.zeros(2), jnp.ones(2),
            intr, n_levels,
        )
        assert outs["T"].shape == (4, 4, 4)
        # at least the gt-initialized hypothesis must be good and accurate
        assert bool(outs["good"][1])
        err = lie.se3_log(outs["T"][1] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 5e-3


class TestAffine:
    def test_brightness_change_recovered(self):
        """Scale/offset the new image; tracker must absorb it in (a, b)."""
        calib, img_ref, idepth_ref, img_new, T_gt = make_scene(
            [0.01, 0.0, 0.01, 0.0, 0.005, 0.0]
        )
        img_new2 = img_new * 1.15 + 8.0  # a=1.15, b=8
        n_levels = calib.levels
        tmpls = tuple(make_templates(calib, img_ref, idepth_ref, n_levels))
        pyr_new, _ = imops.build_pyramid(img_new2, n_levels)
        intr = tuple(calib.intrinsics(l) for l in range(n_levels))
        out = tracker.track_newest_coarse(
            pyr_new, tmpls, jnp.eye(4), jnp.zeros(2), jnp.zeros(2),
            jnp.ones(2), jnp.full((6,), jnp.nan), intr, n_levels,
        )
        assert bool(out["good"])
        a_rel = float(jnp.exp(out["aff"][0]))
        assert abs(a_rel - 1.15) < 0.05, a_rel
        err = lie.se3_log(out["T"] @ lie.se3_inv(T_gt))
        assert float(jnp.linalg.norm(err)) < 5e-3
