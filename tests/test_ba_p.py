"""Pallas fused BA iteration (ops/ba_p.py) vs the reference-shaped einsum
forms (ops/ba.py), in interpret mode.

Every FusedOut field must match its ops/ba.py twin to f32 tolerance
(summation order differs; exact bit-equality is not expected). Residual
STATES must match exactly — the outlier/OOB decisions gate downstream
bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models import energy as E
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_p as BP
from tests.test_ba import SETTINGS, W, H, build_window


def _mixed_host_window():
    """Window with noise + points spread across 3 host frames (same
    construction as test_ba_t)."""
    ba, dI, _, _ = build_window(n_frames=4, n_points=128, pose_noise=0.02,
                                idepth_noise=0.3, seed=3)
    P, F = ba.P, ba.F
    key = jax.random.PRNGKey(11)
    host = jax.random.randint(key, (P,), 0, 3)
    res_exist = (
        ba.pt_valid[:, None] & ba.frame_valid[None, :]
        & (jnp.arange(F)[None, :] != host[:, None])
    )
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
    fo = BP.fused_iteration(ba, pre, dI, SETTINGS, W, H, interpret=True)
    return ba, dI, pre, lin, fo


def _close(a, b, tol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.max(np.abs(a))))
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol * scale)


class TestFusedStep:
    def test_energies(self, win):
        ba, dI, pre, lin, fo = win
        _close(lin.energy, fo.energy.T)
        _close(lin.energy_raw, fo.energy_raw.T)

    def test_states_match_exactly(self, win):
        ba, dI, pre, lin, fo = win
        np.testing.assert_array_equal(np.asarray(lin.new_state),
                                      np.asarray(fo.new_state.T))
        np.testing.assert_array_equal(np.asarray(lin.active),
                                      np.asarray(fo.active.T))

    def test_top(self, win):
        ba, dI, pre, lin, fo = win
        H0, b0 = B.accumulate_top(ba, pre, lin)
        _close(H0, fo.H_top)
        _close(b0, fo.b_top)

    def test_schur(self, win):
        ba, dI, pre, lin, fo = win
        sc0 = B.accumulate_schur(ba, pre, lin)
        _close(sc0.Hdd, fo.sc.Hdd)
        _close(sc0.bd, fo.sc.bd)
        _close(sc0.HdiF, fo.sc.HdiF)
        np.testing.assert_array_equal(np.asarray(sc0.has_res),
                                      np.asarray(fo.sc.has_res))
        _close(sc0.vcross, fo.sc.vcross.T)
        H0, b0 = B.schur_Hb(sc0)
        _close(H0, fo.H_sc)
        _close(b0, fo.b_sc)

    def test_energy_th_update(self, win):
        """update_energy_th on the fused outputs (duck-typed lanes-last
        lin) matches the einsum form."""
        from sos_slam_tpu.ops import ba_t as BT
        ba, dI, pre, lin, fo = win
        _close(E.update_energy_th(ba, lin, SETTINGS),
               BT.update_energy_th_t(ba, fo, SETTINGS), tol=1e-5)


class TestFusedMargMode:
    def test_rz_top_schur(self, win):
        ba, dI, pre, lin, fo = win
        pmask = (jnp.arange(ba.P) % 3 == 0) & ba.pt_valid
        fo2 = BP.fused_iteration(
            ba, pre, dI, SETTINGS, W, H, pmask=pmask, use_rz=True,
            shift_prior_to_zero=False,
            prior_fac=SETTINGS.idepth_fix_prior_marg_fac, interpret=True)
        linm = E._mask_lin(lin, pmask)
        rz = B.res_to_zero(ba, pre, linm)
        H0, b0 = B.accumulate_top(ba, pre, linm, resApprox=rz)
        _close(H0, fo2.H_top)
        _close(b0, fo2.b_top)
        sc0 = B.accumulate_schur(
            ba, pre, linm, resApprox=rz, shift_prior_to_zero=False,
            prior_fac=SETTINGS.idepth_fix_prior_marg_fac)
        _close(sc0.Hdd, fo2.sc.Hdd)
        _close(sc0.bd, fo2.sc.bd)
        np.testing.assert_array_equal(np.asarray(sc0.has_res),
                                      np.asarray(fo2.sc.has_res))
        H1, b1 = B.schur_Hb(sc0)
        _close(H1, fo2.H_sc)
        _close(b1, fo2.b_sc)


class TestFusedGnParity:
    def test_full_gn_solve(self, win):
        """One complete GN step through the fused path matches the einsum
        path's solution to f32 tolerance."""
        ba, dI, pre, lin, fo = win
        # einsum path
        H_top, b_top = B.accumulate_top(ba, pre, lin)
        H_top, b_top = B.add_priors(ba, H_top, b_top, SETTINGS)
        sc = B.accumulate_schur(ba, pre, lin)
        H_sc, b_sc = B.schur_Hb(sc)
        x0 = B.solve_system(ba, H_top, b_top, H_sc, b_sc)
        step0 = B.resubstitute(sc, x0)
        # fused path
        Hf, bf = B.add_priors(ba, fo.H_top, fo.b_top, SETTINGS)
        x1 = B.solve_system(ba, Hf, bf, fo.H_sc, fo.b_sc)
        from sos_slam_tpu.ops import ba_t as BT
        step1 = BT.resubstitute_t(fo.sc, x1)
        _close(x0, x1, tol=5e-3)
        _close(step0, step1, tol=5e-3)


def test_activation_fused_matches(monkeypatch):
    """activate_points through the Pallas act_pass kernel (interpret)
    matches the XLA path: same accepted set, same depths."""
    from sos_slam_tpu.ops import image as imops
    from sos_slam_tpu.ops import trace as T
    from sos_slam_tpu.utils import lie, synthetic
    from tests.test_trace import setup_scene, make_points, W as TW, H as TH

    calib, dI_ref, dI_new, idepth_ref, KRKi, Kt = setup_scene()
    imm = make_points(calib, dI_ref)
    imm = T.trace_points(imm, dI_new, KRKi[None], Kt[None],
                         jnp.array([[1.0, 0.0]]), TW, TH, SETTINGS)
    F = 2
    dI = jnp.stack([dI_ref, dI_new])
    T_new = lie.se3_exp(jnp.array([0.06, 0, 0, 0, 0, 0], jnp.float32))
    rel = jnp.zeros((F, F, 4, 4))
    rel = rel.at[0, 1].set(lie.se3_inv(T_new))
    rel = rel.at[0, 0].set(jnp.eye(4))
    rel = rel.at[1, 1].set(jnp.eye(4))
    rel = rel.at[1, 0].set(T_new)
    affLL = jnp.broadcast_to(jnp.array([1.0, 0.0]), (F, F, 2))
    cand = imm.valid & (imm.status == T.IPS_GOOD)
    args = (imm, cand, dI, rel[..., :3, :3], rel[..., :3, 3], affLL,
            jnp.array([True, True]), calib.intrinsics(0), TW, TH, SETTINGS)

    T.activate_points.clear_cache()
    monkeypatch.setenv("SOS_SLAM_BA_P", "0")
    id0, ok0, ri0 = jax.tree.map(np.asarray, T.activate_points(*args))
    T.activate_points.clear_cache()
    monkeypatch.setenv("SOS_SLAM_BA_P", "1")
    id1, ok1, ri1 = jax.tree.map(np.asarray, T.activate_points(*args))
    T.activate_points.clear_cache()

    np.testing.assert_array_equal(ok0, ok1)
    np.testing.assert_array_equal(ri0, ri1)
    np.testing.assert_allclose(id0[ok0], id1[ok1], rtol=1e-4, atol=1e-5)


def test_optimize_e2e_matches(monkeypatch):
    """Full windowed BA through the fused path (interpret on CPU) lands on
    the same optimum as the einsum path. Small f32 summation-order
    differences accumulate over iterations, so this checks convergence
    agreement, not bit equality (the single-pass tests above do the tight
    field-level comparisons)."""
    ba, dI = _mixed_host_window()
    E.optimize.clear_cache()
    monkeypatch.setenv("SOS_SLAM_BA_P", "0")
    r0, s0 = E.optimize(ba, dI, SETTINGS, W, H, max_its=4)
    E.optimize.clear_cache()
    monkeypatch.setenv("SOS_SLAM_BA_P", "1")
    r1, s1 = E.optimize(ba, dI, SETTINGS, W, H, max_its=4)
    E.optimize.clear_cache()
    assert np.isfinite(float(s1["rmse"]))
    np.testing.assert_allclose(float(s0["rmse"]), float(s1["rmse"]),
                               rtol=0.02)
    assert abs(int(s0["n_active"]) - int(s1["n_active"])) <= 5
    np.testing.assert_allclose(np.asarray(r0.state), np.asarray(r1.state),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(r0.c), np.asarray(r1.c),
                               atol=2e-3)
