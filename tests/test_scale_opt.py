"""Stereo scale-optimizer tests on the synthetic plane scene."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.ops import scale_opt as SO
from sos_slam_tpu.ops.tracker import LevelTemplate
from sos_slam_tpu.utils import lie, synthetic

W, H = 256, 192
BASELINE = 0.11  # meters, EuRoC-like


def make_stereo(map_scale=1.0, plane_z=2.0):
    """Left at identity; right displaced +x by BASELINE. Template idepths are
    map-scaled: id_map = id_true * map_scale, so the optimum s = map_scale."""
    calib = synthetic.default_calib(W, H)
    n_levels = calib.levels
    T_right = jnp.eye(4).at[0, 3].set(BASELINE)   # right cam at +x
    img_l, idepth_l = synthetic.render_plane(calib, jnp.eye(4), plane_z)
    img_r, _ = synthetic.render_plane(calib, T_right, plane_z)
    pyr_l, _ = imops.build_pyramid(img_l, n_levels)
    pyr_r, _ = imops.build_pyramid(img_r, n_levels)

    T_lr = lie.se3_inv(T_right)    # left -> right
    R01 = T_lr[:3, :3]
    t01 = T_lr[:3, 3]

    tmpls = []
    idp = idepth_l
    for lvl in range(n_levels):
        hl, wl = pyr_l[lvl].shape[:2]
        s = max(4 >> lvl, 1)
        vv, uu = jnp.meshgrid(jnp.arange(4, hl - 4, s, dtype=jnp.float32),
                              jnp.arange(4, wl - 4, s, dtype=jnp.float32),
                              indexing="ij")
        u, v = uu.reshape(-1), vv.reshape(-1)
        tmpls.append(LevelTemplate(
            u=u, v=v,
            idepth=imops.interp_bilinear(idp, u, v) * map_scale,
            color=imops.interp_bilinear(pyr_l[lvl][..., 0], u, v),
            valid=jnp.ones_like(u, dtype=bool)))
        if lvl + 1 < n_levels:
            idp = imops.downsample2x(idp)

    intr = tuple(calib.intrinsics(l) for l in range(n_levels))
    return pyr_r, tuple(tmpls), R01, t01, intr, n_levels


class TestScaleOpt:
    def test_unit_scale_recovered(self):
        pyr_r, tmpls, R01, t01, intr, nl = make_stereo(map_scale=1.0)
        s, err = SO.optimize_scale(pyr_r, tmpls, jnp.float32(0.7), R01, t01,
                                   intr, intr, nl)
        assert abs(float(s) - 1.0) < 0.02, float(s)
        assert float(err) < 6.0, float(err)

    def test_map_scale_2_recovered(self):
        pyr_r, tmpls, R01, t01, intr, nl = make_stereo(map_scale=2.0)
        s, err = SO.optimize_scale(pyr_r, tmpls, jnp.float32(1.0), R01, t01,
                                   intr, intr, nl)
        assert abs(float(s) - 2.0) < 0.05, float(s)

    def test_multi_guess(self):
        pyr_r, tmpls, R01, t01, intr, nl = make_stereo(map_scale=0.4)
        s, err = SO.optimize_scale_multi_guess(pyr_r, tmpls, R01, t01,
                                               intr, intr, nl)
        assert abs(float(s) - 0.4) < 0.03, float(s)
        assert np.isfinite(float(err))

    def test_bad_scale_high_error(self):
        """Far-off fixed scale (no iterations to fix it) must show a high
        residual, which is the acceptance signal the driver thresholds."""
        pyr_r, tmpls, R01, t01, intr, nl = make_stereo(map_scale=1.0)
        # evaluate residual at a wrong scale by disallowing movement
        from sos_slam_tpu.ops.scale_opt import res_and_hb_scale
        r = res_and_hb_scale(pyr_r[0], tmpls[0], jnp.float32(3.0), R01, t01,
                             intr[0], intr[0], jnp.float32(20.0), 9.0)
        rms_bad = float(jnp.sqrt(r["E"] / jnp.maximum(r["num_in"], 1)))
        r2 = res_and_hb_scale(pyr_r[0], tmpls[0], jnp.float32(1.0), R01, t01,
                              intr[0], intr[0], jnp.float32(20.0), 9.0)
        rms_good = float(jnp.sqrt(r2["E"] / jnp.maximum(r2["num_in"], 1)))
        assert rms_bad > 3 * rms_good, (rms_bad, rms_good)
