"""Epipolar trace + point activation tests on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.ops import trace as T
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import default_settings

SETTINGS = default_settings()
W, H = 256, 192
N = 256


def setup_scene(twist=(0.06, 0.0, 0.0, 0.0, 0.0, 0.0), plane_z=2.0):
    calib = synthetic.default_calib(W, H)
    fx, fy, cx, cy = calib.intrinsics(0)
    K = jnp.array(calib.K(0))
    T_new = lie.se3_exp(jnp.array(twist, jnp.float32))
    img_ref, idepth_ref = synthetic.render_plane(calib, jnp.eye(4), plane_z)
    img_new, _ = synthetic.render_plane(calib, T_new, plane_z)
    lr, _ = imops.build_pyramid(img_ref, 1)
    ln, _ = imops.build_pyramid(img_new, 1)
    T_rn = lie.se3_inv(T_new)  # ref -> new
    R, t = T_rn[:3, :3], T_rn[:3, 3]
    KRKi = K @ R @ jnp.linalg.inv(K)
    Kt = K @ t
    return calib, lr[0], ln[0], idepth_ref, KRKi, Kt


def make_points(calib, dI_ref, n=200, seed=0):
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (N,)) * (W - 24) + 12
    v = jax.random.uniform(jax.random.fold_in(key, 1), (N,)) * (H - 24) + 12
    my_type = (jnp.arange(N) < n).astype(jnp.int32)
    return T.init_immature(u, v, jnp.zeros(N, jnp.int32), my_type, dI_ref,
                           SETTINGS, N)


class TestTrace:
    def test_first_trace_brackets_truth(self):
        calib, dI_ref, dI_new, idepth_ref, KRKi, Kt = setup_scene()
        imm = make_points(calib, dI_ref)
        imm2 = T.trace_points(
            imm, dI_new, KRKi[None], Kt[None], jnp.array([[1.0, 0.0]]),
            W, H, SETTINGS,
        )
        good = np.asarray(imm2.status == T.IPS_GOOD) & np.asarray(imm.valid)
        assert good.sum() > 100, good.sum()
        idt = np.asarray(imops.interp_bilinear(idepth_ref, imm.u, imm.v))
        lo = np.asarray(imm2.idepth_min)
        hi = np.asarray(imm2.idepth_max)
        frac = ((idt >= lo - 0.02) & (idt <= hi + 0.02))[good].mean()
        assert frac > 0.9, frac

    def test_interval_shrinks_with_more_traces(self):
        calib, dI_ref, dI_new, idepth_ref, KRKi, Kt = setup_scene()
        imm = make_points(calib, dI_ref)
        aff = jnp.array([[1.0, 0.0]])
        imm1 = T.trace_points(imm, dI_new, KRKi[None], Kt[None], aff, W, H,
                              SETTINGS)
        # second trace with a different baseline
        calib2, _, dI_new2, _, KRKi2, Kt2 = setup_scene(
            twist=(0.0, 0.05, 0.01, 0.0, 0.0, 0.0))
        imm2 = T.trace_points(imm1, dI_new2, KRKi2[None], Kt2[None], aff, W, H,
                              SETTINGS)
        g = np.asarray((imm2.status == T.IPS_GOOD) & imm.valid)
        w1 = np.asarray(imm1.idepth_max - imm1.idepth_min)
        w2 = np.asarray(imm2.idepth_max - imm2.idepth_min)
        finite = np.isfinite(w1) & np.isfinite(w2) & g
        assert finite.sum() > 50
        assert np.median(w2[finite]) <= np.median(w1[finite]) + 1e-3

    def test_zero_baseline_no_crash(self):
        calib, dI_ref, dI_new, _, _, _ = setup_scene()
        imm = make_points(calib, dI_ref)
        K = jnp.array(calib.K(0))
        KRKi = (K @ jnp.eye(3) @ jnp.linalg.inv(K))[None]
        Kt = jnp.zeros((1, 3))
        imm2 = T.trace_points(imm, dI_ref, KRKi, Kt, jnp.array([[1.0, 0.0]]),
                              W, H, SETTINGS)
        assert np.isfinite(np.asarray(imm2.quality)).all()


class TestActivation:
    def test_activation_recovers_depth(self):
        calib, dI_ref, dI_new, idepth_ref, KRKi, Kt = setup_scene()
        imm = make_points(calib, dI_ref)
        imm = T.trace_points(imm, dI_new, KRKi[None], Kt[None],
                             jnp.array([[1.0, 0.0]]), W, H, SETTINGS)

        # window of 2 frames: host 0 and target 1
        F = 2
        dI = jnp.stack([dI_ref, dI_new])
        T_new = lie.se3_exp(jnp.array([0.06, 0, 0, 0, 0, 0], jnp.float32))
        rel = jnp.zeros((F, F, 4, 4))
        rel = rel.at[0, 1].set(lie.se3_inv(T_new))
        rel = rel.at[0, 0].set(jnp.eye(4))
        rel = rel.at[1, 1].set(jnp.eye(4))
        rel = rel.at[1, 0].set(T_new)
        R = rel[..., :3, :3]
        t = rel[..., :3, 3]
        affLL = jnp.broadcast_to(jnp.array([1.0, 0.0]), (F, F, 2))
        cand = imm.valid & (imm.status == T.IPS_GOOD)
        idepth, ok, res_in = T.activate_points(
            imm, cand, dI, R, t, affLL, jnp.array([True, True]),
            calib.intrinsics(0), W, H, SETTINGS,
        )
        nok = int(jnp.sum(ok))
        assert nok > 80, nok
        idt = np.asarray(imops.interp_bilinear(idepth_ref, imm.u, imm.v))
        err = np.abs(np.asarray(idepth) - idt)[np.asarray(ok)]
        assert np.median(err) < 0.02, np.median(err)
