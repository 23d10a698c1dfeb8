"""Bundle-adjustment tests: FD gradient checks + synthetic convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models import energy as E
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.utils import lie, synthetic
from sos_slam_tpu.utils.config import PATTERN_OFFSETS, default_settings

KEY = jax.random.PRNGKey(42)
W, H = 192, 128
F = 4   # window slots
P = 128 # point slots
SETTINGS = default_settings()


def build_window(n_frames=3, n_points=100, pose_noise=0.0, idepth_noise=0.0,
                 plane_z=2.0, pt_prior=True, seed=0):
    """Construct a BAState + stacked images from the synthetic plane."""
    calib = synthetic.default_calib(W, H)
    fx, fy, cx, cy = calib.intrinsics(0)
    twist = jnp.array([0.04, 0.02, 0.03, 0.004, 0.008, 0.004])
    imgs, idepths, poses = synthetic.make_sequence(
        calib, n_frames, twist_per_frame=twist, plane_z=plane_z, seed=seed)

    dI = jnp.zeros((F, H, W, 3), jnp.float32)
    for i in range(n_frames):
        lv, _ = imops.build_pyramid(imgs[i], 1)
        dI = dI.at[i].set(lv[0])

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    # points hosted in frame 0 on a jittered grid
    gw = int(np.ceil(np.sqrt(n_points)))
    us = jnp.linspace(8, W - 9, gw)
    vs = jnp.linspace(8, H - 9, gw)
    uu, vv = jnp.meshgrid(us, vs)
    u = uu.reshape(-1)[:n_points]
    v = vv.reshape(-1)[:n_points]
    u = jnp.pad(u, (0, P - n_points))
    v = jnp.pad(v, (0, P - n_points))
    pt_valid = jnp.arange(P) < n_points

    idp_true = imops.interp_bilinear(idepths[0], u, v)
    idp = idp_true * (1.0 + idepth_noise * jax.random.normal(k2, (P,)))

    pat = jnp.asarray(PATTERN_OFFSETS)
    color = imops.interp_bilinear(
        dI[0][..., 0], u[:, None] + pat[None, :, 0], v[:, None] + pat[None, :, 1]
    )

    # frame states: identity internal state; eval PT = (noisy) gt pose
    T_eval = jnp.stack([jnp.eye(4)] * F)
    for i in range(n_frames):
        noise = pose_noise * jax.random.normal(jax.random.fold_in(k1, i), (6,))
        if i == 0:
            noise = jnp.zeros(6)
        T_eval = T_eval.at[i].set(lie.se3_exp(noise) @ poses[i])

    frame_valid = jnp.arange(F) < n_frames
    prior = jnp.zeros((F, 8))
    # first frame pinned (getPrior, HessianBlocks.h:292-314)
    prior = prior.at[0, 0:3].set(SETTINGS.initial_trans_prior)
    prior = prior.at[0, 3:6].set(SETTINGS.initial_rot_prior)
    prior = prior.at[0, 6].set(SETTINGS.initial_aff_a_prior)
    prior = prior.at[0, 7].set(SETTINGS.initial_aff_b_prior)
    prior = prior.at[1:, 6].set(SETTINGS.affine_opt_mode_a)
    prior = prior.at[1:, 7].set(SETTINGS.affine_opt_mode_b)
    prior = prior * frame_valid[:, None]

    res_exist = (
        pt_valid[:, None] & frame_valid[None, :]
        & (jnp.arange(F)[None, :] != 0)
    )

    c = jnp.array([fx, fy, cx, cy]) / B.CALIB_SCALE

    ba = B.BAState(
        frame_valid=frame_valid,
        T_cw_eval=T_eval,
        state=jnp.zeros((F, 8)),
        state_zero=jnp.zeros((F, 8)),
        exposure=jnp.ones(F),
        energy_th=jnp.full((F,), 12.0 * 12.0 * 8.0),
        prior=prior,
        c=c, c_zero=c,
        pt_valid=pt_valid,
        host=jnp.zeros(P, jnp.int32),
        u=u, v=v,
        color=color, weight=jnp.ones((P, 8)),
        idepth=idp * pt_valid, idepth_zero=idp * pt_valid,
        pt_prior=(SETTINGS.idepth_fix_prior if pt_prior else 0.0)
        * jnp.ones(P) * pt_valid,
        res_exist=res_exist,
        res_state=jnp.zeros((P, F), jnp.int8),
        HM=jnp.zeros((4 + 8 * F, 4 + 8 * F)),
        bM=jnp.zeros(4 + 8 * F),
    )
    return ba, dI, poses, idp_true


def total_energy(ba, dI):
    pre = B.make_precalc(ba)
    lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
    live = lin.active
    return jnp.sum(jnp.where(live, lin.energy_raw, 0.0))


class TestGradient:
    def test_b_matches_fd_gradient(self):
        """b (internal units) must equal dE/2 d(state) by finite differences.

        Gauss-Newton with energy E = sum r_w^2 gives b = J^T r = grad(E)/2
        when hw == 1 (small residuals) and FEJ deltas are zero.
        """
        ba, dI, _, _ = build_window(n_frames=3, pose_noise=0.0,
                                    idepth_noise=0.0, pt_prior=False)
        pre = B.make_precalc(ba)
        lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
        H_top, b = B.accumulate_top(ba, pre, lin)

        # numeric gradient wrt frame-1 internal state
        def energy_of(s1):
            ba2 = ba._replace(state=ba.state.at[1].set(s1))
            pre2 = B.make_precalc(ba2)
            lin2 = B.linearize(ba2, pre2, dI, SETTINGS, W, H)
            # keep the SAME active set (mask by lin.active of base) and use
            # raw quadratic energy sum over hw-weighted residuals
            return 0.5 * jnp.sum(
                jnp.where(lin.active, jnp.sum(lin2.resF ** 2, -1), 0.0)
            )

        g_num = np.zeros(8)
        eps = 1e-4
        for i in range(8):
            sp = ba.state[1].at[i].add(eps)
            sm = ba.state[1].at[i].add(-eps)
            g_num[i] = (float(energy_of(sp)) - float(energy_of(sm))) / (2 * eps)

        b_frame1 = np.asarray(b[4 + 8 * 1: 4 + 8 * 2])
        scale = max(np.abs(g_num).max(), 1e-3)
        np.testing.assert_allclose(b_frame1 / scale, g_num / scale, atol=2e-2)

    def test_idepth_gradient_matches_fd(self):
        ba, dI, _, _ = build_window(n_frames=3, pt_prior=False)
        pre = B.make_precalc(ba)
        lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
        sc = B.accumulate_schur(ba, pre, lin)

        pi = 40  # a valid point index

        def energy_of(idp_val):
            ba2 = ba._replace(idepth=ba.idepth.at[pi].set(idp_val))
            pre2 = B.make_precalc(ba2)
            lin2 = B.linearize(ba2, pre2, dI, SETTINGS, W, H)
            return 0.5 * jnp.sum(
                jnp.where(lin.active[pi], jnp.sum(lin2.resF[pi] ** 2, -1), 0.0)
            )

        eps = 1e-5
        x0 = float(ba.idepth[pi])
        g_num = (float(energy_of(x0 + eps)) - float(energy_of(x0 - eps))) / (2 * eps)
        g_ana = float(sc.bd[pi])
        assert abs(g_num - g_ana) / max(abs(g_num), 1e-3) < 2e-2, (g_num, g_ana)


class TestOptimize:
    def test_energy_decreases_and_poses_converge(self):
        # pose noise only; depth prior pulls toward the true structure, so
        # the scale gauge is pinned and poses must converge to gt
        ba, dI, poses_gt, _ = build_window(
            n_frames=3, pose_noise=0.01, idepth_noise=0.0)
        e0 = float(total_energy(ba, dI))
        ba2, stats = E.optimize(ba, dI, SETTINGS, W, H, max_its=10)
        e1 = float(stats["energy"])
        assert not bool(stats["is_lost"])
        assert e1 < e0, (e0, e1)

        T0 = B.state_to_pose(ba.T_cw_eval, ba.state)[2]
        err0 = float(jnp.linalg.norm(lie.se3_log(lie.se3_inv(T0) @ poses_gt[2])))
        T2 = B.state_to_pose(ba2.T_cw_eval, ba2.state)[2]
        err = float(jnp.linalg.norm(lie.se3_log(lie.se3_inv(T2) @ poses_gt[2])))
        assert err < 0.25 * err0, (err0, err)
        # absolute floor set by FEJ (geometry jacobians stay at the noisy
        # eval point, like the reference) + synthetic texture sampling noise
        assert err < 8e-3, err

    def test_perfect_init_stays(self):
        ba, dI, poses_gt, _ = build_window(n_frames=3)
        ba2, stats = E.optimize(ba, dI, SETTINGS, W, H, max_its=6)
        T1 = B.state_to_pose(ba2.T_cw_eval, ba2.state)[1]
        err = float(jnp.linalg.norm(lie.se3_log(lie.se3_inv(T1) @ poses_gt[1])))
        assert err < 2e-3, err
        assert float(stats["rmse"]) < 3.0

    def test_idepth_refinement(self):
        ba, dI, _, idp_true = build_window(
            n_frames=3, idepth_noise=0.08, pt_prior=False)
        err0 = float(jnp.mean(jnp.abs((ba.idepth - idp_true) * ba.pt_valid)))
        ba2, _ = E.optimize(ba, dI, SETTINGS, W, H, max_its=8)
        err1 = float(jnp.mean(jnp.abs((ba2.idepth - idp_true) * ba2.pt_valid)))
        assert err1 < 0.5 * err0, (err0, err1)


class TestMarginalization:
    def test_point_marg_builds_prior(self):
        ba, dI, _, _ = build_window(n_frames=3)
        ba2, _ = E.optimize(ba, dI, SETTINGS, W, H, max_its=4)
        marg = ba2.pt_valid & (jnp.arange(P) < 30)
        ba3 = E.marginalize_points(ba2, dI, marg, SETTINGS, W, H)
        assert int(jnp.sum(ba3.pt_valid)) == int(jnp.sum(ba2.pt_valid)) - 30
        assert float(jnp.abs(ba3.HM).sum()) > 0.0
        # HM must stay symmetric (relative to its scale)
        sym_err = float(jnp.abs(ba3.HM - ba3.HM.T).max())
        assert sym_err <= 1e-6 * max(float(jnp.abs(ba3.HM).max()), 1.0)

    def test_frame_marg_compacts_window(self):
        ba, dI, _, _ = build_window(n_frames=3)
        ba2, _ = E.optimize(ba, dI, SETTINGS, W, H, max_its=4)
        # marginalize points hosted anywhere targeting frame 1, then the frame
        marg = ba2.pt_valid & (jnp.arange(P) % 3 == 0)
        ba3 = E.marginalize_points(ba2, dI, marg, SETTINGS, W, H)
        # frame 1 out (points all hosted in 0, so no host conflicts)
        ba3 = ba3._replace(
            res_exist=ba3.res_exist.at[:, 1].set(False))
        ba4 = E.marginalize_frame(ba3, jnp.int32(1))
        assert int(jnp.sum(ba4.frame_valid)) == 2
        # old frame 2 now in slot 1
        T_new = B.state_to_pose(ba4.T_cw_eval, ba4.state)
        T_old = B.state_to_pose(ba3.T_cw_eval, ba3.state)
        np.testing.assert_allclose(T_new[1], T_old[2], atol=1e-5)
        # marg prior must be non-trivial and finite
        assert np.isfinite(np.asarray(ba4.HM)).all()
        assert float(jnp.abs(ba4.HM).sum()) > 0

    def test_optimize_after_marginalization(self):
        """BA must still run and stay stable after frame marginalization."""
        ba, dI, poses_gt, _ = build_window(n_frames=3, pose_noise=0.005)
        ba2, _ = E.optimize(ba, dI, SETTINGS, W, H, max_its=6)
        marg = ba2.pt_valid & (jnp.arange(P) % 2 == 0)
        ba3 = E.marginalize_points(ba2, dI, marg, SETTINGS, W, H)
        ba3 = ba3._replace(res_exist=ba3.res_exist.at[:, 1].set(False))
        ba4 = E.marginalize_frame(ba3, jnp.int32(1))
        dI2 = dI.at[1].set(dI[2])
        ba5, stats = E.optimize(ba4, dI2, SETTINGS, W, H, max_its=4)
        assert not bool(stats["is_lost"])
        assert np.isfinite(float(stats["energy"]))


class TestEnergyColumn:
    def test_column_matches_full_linearize(self):
        """linearize_energy_col must be bitwise the k-column of the full
        linearization's (energy, new_state)."""
        ba, dI, _, _ = build_window(n_frames=4, n_points=80,
                                    pose_noise=0.01, idepth_noise=0.05)
        pre = B.make_precalc(ba)
        lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
        for k in range(4):
            e_col, st_col = B.linearize_energy_col(
                ba, pre, dI, jnp.int32(k), SETTINGS, W, H)
            np.testing.assert_array_equal(np.asarray(e_col),
                                          np.asarray(lin.energy[:, k]))
            np.testing.assert_array_equal(np.asarray(st_col),
                                          np.asarray(lin.new_state[:, k]))


class TestAccumulateKR:
    def test_kr_matches_einsum_form(self):
        """accumulate_top_kr (matmul/khatri-rao shape) must match the
        factored einsum form to f32 rounding, including mixed hosts and
        a FEJ-shifted resApprox."""
        ba, dI, _, _ = build_window(n_frames=4, n_points=80,
                                    pose_noise=0.01, idepth_noise=0.05)
        # spread hosts over slots 0..2 and keep residuals to other frames
        key = jax.random.PRNGKey(3)
        host = jax.random.randint(key, (P,), 0, 3)
        res_exist = (
            ba.pt_valid[:, None] & ba.frame_valid[None, :]
            & (jnp.arange(F)[None, :] != host[:, None])
        )
        # a nonzero FEJ delta so adHTdelta / res_toZero paths are exercised
        state = ba.state.at[1, :6].add(1e-3).at[2, 6:].add(5e-3)
        ba = ba._replace(host=host, res_exist=res_exist, state=state)
        pre = B.make_precalc(ba)
        lin = B.linearize(ba, pre, dI, SETTINGS, W, H)

        for resApprox in (None, B.res_to_zero(ba, pre, lin)):
            H1, b1 = B.accumulate_top(ba, pre, lin, resApprox=resApprox)
            H2, b2 = B.accumulate_top_kr(ba, pre, lin, resApprox=resApprox)
            scale = float(jnp.max(jnp.abs(H1))) + 1e-9
            np.testing.assert_allclose(np.asarray(H2), np.asarray(H1),
                                       rtol=0, atol=2e-5 * scale)
            bscale = float(jnp.max(jnp.abs(b1))) + 1e-9
            np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                                       rtol=0, atol=2e-5 * bscale)
