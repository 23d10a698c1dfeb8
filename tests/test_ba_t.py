"""Lanes-last (transposed) BA forms vs the reference-shaped forms.

Every ops/ba_t.py output must match its ops/ba.py twin to f32 tolerance
(summation order differs, exact bit-equality is not expected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models import energy as E
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_t as BT
from tests.test_ba import SETTINGS, W, H, build_window


def _mixed_host_window():
    """Window with noise + points spread across 3 host frames (exercises
    the one-hot contractions against the gather-based forms)."""
    ba, dI, _, _ = build_window(n_frames=4, n_points=120, pose_noise=0.02,
                                idepth_noise=0.3, seed=3)
    P, F = ba.P, ba.F
    key = jax.random.PRNGKey(11)
    host = jax.random.randint(key, (P,), 0, 3)
    res_exist = (
        ba.pt_valid[:, None] & ba.frame_valid[None, :]
        & (jnp.arange(F)[None, :] != host[:, None])
    )
    # a few prior-OOB entries to exercise the sticky-OOB path
    res_state = jnp.where(
        (jnp.arange(P)[:, None] % 17 == 0) & res_exist,
        jnp.int8(B.RES_OOB), jnp.int8(0))
    ba = ba._replace(
        host=host, res_exist=res_exist, res_state=res_state,
        state=ba.state + 0.01 * jax.random.normal(
            jax.random.fold_in(key, 1), ba.state.shape),
        idepth=ba.idepth + 0.05 * ba.pt_valid
        * jax.random.normal(jax.random.fold_in(key, 2), (P,)),
    )
    return ba, dI


@pytest.fixture(scope="module")
def win():
    ba, dI = _mixed_host_window()
    pre = B.make_precalc(ba)
    lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
    lin_t = BT.linearize_t(ba, pre, dI, SETTINGS, W, H)
    return ba, dI, pre, lin, lin_t


def _close(a, b, tol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.max(np.abs(a))))
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol * scale)


class TestLinearizeT:
    def test_fields_match(self, win):
        ba, dI, pre, lin, lt = win
        _close(lin.X, jnp.moveaxis(lt.X, -1, 0))
        _close(lin.Jpdd, jnp.moveaxis(lt.Jpdd, -1, 0))
        _close(lin.resF, jnp.moveaxis(lt.resF, -1, 0))
        _close(lin.JIdx, jnp.moveaxis(lt.JIdx, -1, 0))
        _close(lin.JabF, jnp.moveaxis(lt.JabF, -1, 0))
        _close(lin.JIdx2, jnp.moveaxis(lt.JIdx2, -1, 0))
        _close(lin.JabJIdx, jnp.moveaxis(lt.JabJIdx, -1, 0))
        _close(lin.Jab2, jnp.moveaxis(lt.Jab2, -1, 0))
        _close(lin.energy, lt.energy.T)
        _close(lin.energy_raw, lt.energy_raw.T)

    def test_states_match_exactly(self, win):
        ba, dI, pre, lin, lt = win
        np.testing.assert_array_equal(np.asarray(lin.new_state),
                                      np.asarray(lt.new_state.T))
        np.testing.assert_array_equal(np.asarray(lin.active),
                                      np.asarray(lt.active.T))

    def test_update_energy_th(self, win):
        ba, dI, pre, lin, lt = win
        _close(E.update_energy_th(ba, lin, SETTINGS),
               BT.update_energy_th_t(ba, lt, SETTINGS), tol=1e-5)


class TestAccumulateT:
    def test_top(self, win):
        ba, dI, pre, lin, lt = win
        H0, b0 = B.accumulate_top(ba, pre, lin)
        H1, b1 = BT.accumulate_top_t(ba, pre, lt)
        _close(H0, H1)
        _close(b0, b1)

    def test_top_marg_mode(self, win):
        ba, dI, pre, lin, lt = win
        rz = B.res_to_zero(ba, pre, lin)
        rzt = BT.res_to_zero_t(ba, pre, lt)
        _close(rz, jnp.moveaxis(rzt, -1, 0))
        H0, b0 = B.accumulate_top(ba, pre, lin, resApprox=rz)
        H1, b1 = BT.accumulate_top_t(ba, pre, lt, resApprox=rzt)
        _close(H0, H1)
        _close(b0, b1)

    def test_schur(self, win):
        ba, dI, pre, lin, lt = win
        sc0 = B.accumulate_schur(ba, pre, lin)
        sc1 = BT.accumulate_schur_t(ba, pre, lt)
        _close(sc0.Hdd, sc1.Hdd)
        _close(sc0.bd, sc1.bd)
        _close(sc0.HdiF, sc1.HdiF)
        _close(sc0.vcross, sc1.vcross.T)
        H0, b0 = B.schur_Hb(sc0)
        H1, b1 = BT.schur_Hb_t(sc1)
        _close(H0, H1)
        _close(b0, b1)

    def test_resubstitute(self, win):
        ba, dI, pre, lin, lt = win
        sc0 = B.accumulate_schur(ba, pre, lin)
        sc1 = BT.accumulate_schur_t(ba, pre, lt)
        x = 1e-3 * jax.random.normal(jax.random.PRNGKey(5),
                                     (sc0.vcross.shape[1],))
        _close(B.resubstitute(sc0, x), BT.resubstitute_t(sc1, x))

    def test_mask_lin(self, win):
        ba, dI, pre, lin, lt = win
        pmask = jnp.arange(ba.P) % 3 == 0
        m0 = E._mask_lin(lin, pmask)
        m1 = BT.mask_lin_t(lt, pmask)
        rz0 = B.res_to_zero(ba, pre, m0)
        rz1 = BT.res_to_zero_t(ba, pre, m1)
        H0, b0 = B.accumulate_top(ba, pre, m0, resApprox=rz0)
        H1, b1 = BT.accumulate_top_t(ba, pre, m1, resApprox=rz1)
        _close(H0, H1)
        _close(b0, b1)


class TestGnStepT:
    def test_full_solve_matches(self, win):
        """End-to-end: one GN solve through each form pipeline."""
        ba, dI, pre, lin, lt = win

        def solve_orig(ba):
            pre = B.make_precalc(ba)
            lin = B.linearize(ba, pre, dI, SETTINGS, W, H)
            ba2 = ba._replace(energy_th=E.update_energy_th(ba, lin, SETTINGS))
            H_top, b_top = B.accumulate_top(ba2, pre, lin)
            H_top, b_top = B.add_priors(ba2, H_top, b_top, SETTINGS)
            sc = B.accumulate_schur(ba2, pre, lin)
            H_sc, b_sc = B.schur_Hb(sc)
            x = B.solve_system(ba2, H_top, b_top, H_sc, b_sc)
            return x, B.resubstitute(sc, x)

        def solve_t(ba):
            pre = B.make_precalc(ba)
            lin = BT.linearize_t(ba, pre, dI, SETTINGS, W, H)
            ba2 = ba._replace(
                energy_th=BT.update_energy_th_t(ba, lin, SETTINGS))
            H_top, b_top = BT.accumulate_top_t(ba2, pre, lin)
            H_top, b_top = B.add_priors(ba2, H_top, b_top, SETTINGS)
            sc = BT.accumulate_schur_t(ba2, pre, lin)
            H_sc, b_sc = BT.schur_Hb_t(sc)
            x = B.solve_system(ba2, H_top, b_top, H_sc, b_sc)
            return x, BT.resubstitute_t(sc, x)

        x0, s0 = solve_orig(ba)
        x1, s1 = solve_t(ba)
        # the solve amplifies f32 accumulation differences; compare steps
        # at a step-scale tolerance
        _close(x0, x1, tol=2e-3)
        _close(s0, s1, tol=2e-3)

    def test_gn_step_env_switch(self, monkeypatch):
        """energy._forms honors SOS_SLAM_BA_T and both step paths agree."""
        ba, dI = _mixed_host_window()
        monkeypatch.setenv("SOS_SLAM_BA_T", "0")
        ba0, cb0, e0 = E.gn_step(ba, dI, SETTINGS, W, H)
        monkeypatch.setenv("SOS_SLAM_BA_T", "1")
        ba1, cb1, e1 = E.gn_step(ba, dI, SETTINGS, W, H)
        _close(e0, e1, tol=1e-4)
        _close(ba0.state, ba1.state, tol=2e-3)
        _close(ba0.idepth, ba1.idepth, tol=2e-3)
        np.testing.assert_array_equal(np.asarray(ba0.res_state),
                                      np.asarray(ba1.res_state))


class TestActivateT:
    def test_matches_original(self):
        from sos_slam_tpu.ops import trace as TR

        ba, dI = _mixed_host_window()
        pre = B.make_precalc(ba)
        N = 96
        key = jax.random.PRNGKey(7)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        u = jax.random.uniform(k1, (N,), minval=6.0, maxval=W - 7.0)
        v = jax.random.uniform(k2, (N,), minval=6.0, maxval=H - 7.0)
        host = jax.random.randint(k3, (N,), 0, 3)
        from sos_slam_tpu.utils.config import PATTERN_OFFSETS
        pat = jnp.asarray(PATTERN_OFFSETS)
        from sos_slam_tpu.ops import image as imops
        color = jax.vmap(
            lambda hh, uu, vv: imops.interp_bilinear(
                dI[hh][..., 0], uu + pat[:, 0], vv + pat[:, 1]))(
            host, u, v)
        idepth_mid = jax.random.uniform(k4, (N,), minval=0.3, maxval=0.8)
        imm = TR.ImmatureState(
            valid=jnp.ones(N, bool), host=host, u=u, v=v, color=color,
            weights=jnp.ones((N, 8)), gradH=jnp.zeros((N, 2, 2)),
            energy_th=jnp.full((N,), 12.0 * 12.0 * 8.0),
            idepth_min=idepth_mid * 0.8, idepth_max=idepth_mid * 1.2,
            status=jnp.full((N,), TR.IPS_GOOD, jnp.int8),
            quality=jnp.full((N,), 100.0), my_type=jnp.ones(N))
        cand = jnp.arange(N) % 5 != 0
        fx, fy, cx, cy = B.calib_real(ba)
        args = (imm, cand, dI, pre.R, pre.t, pre.affLL, ba.frame_valid,
                (fx, fy, cx, cy), W, H, SETTINGS)
        id0, ok0, ri0 = TR.activate_points(*args)
        id1, ok1, ri1 = TR.activate_points_t(*args)
        # the accept/reject GN ladder can diverge for individual points at
        # f32 rounding ties; require near-total agreement and identical
        # values on the agreeing set
        agree = np.asarray(ok0) == np.asarray(ok1)
        assert agree.mean() >= 0.97
        sel = np.asarray(ok0) & np.asarray(ok1)
        np.testing.assert_allclose(np.asarray(id0)[sel],
                                   np.asarray(id1)[sel], rtol=2e-3, atol=2e-3)
        ri_agree = (np.asarray(ri0) == np.asarray(ri1))[sel]
        assert ri_agree.mean() >= 0.97
