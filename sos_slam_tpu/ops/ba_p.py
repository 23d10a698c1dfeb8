"""Pallas-fused BA iteration: linearize + top/Schur accumulation in ONE
TPU kernel.

This is the Pallas form of the windowed-BA hot chain (the last SSE surface
of the reference without a fused kernel):
  * PointFrameResidual::linearize (src/FullSystem/Residuals.cpp:77-271)
  * AccumulatedTopHessian addPoint/stitch (src/OptimizationBackend/
    AccumulatedTopHessian.cpp:35-147)
  * AccumulatedSCHessian (AccumulatedSCHessian.cpp:32-79)

Why a kernel: the einsum forms (ops/ba.py) materialize every per-residual
intermediate — X (P,F,2,10), JIdx/JabF (P,F,2,8), the (P,F,10,10) G_gg
blocks — in HBM with minor dims of 2/8/10 that XLA pads to (8,128) tiles:
a 13-64x memory blowup on arrays that are only ever consumed once. The
actual arithmetic is ~100 VPU flops + a rank-13 gram per residual; the
whole iteration is bandwidth/overhead-bound, not FLOP-bound. This kernel
keeps everything in VMEM in a lanes-last layout (point axis on the 128
lanes), reads only the gathered image taps + per-point rows once from HBM,
and writes back just the reduced quantities:

  acc   (Fh,Ft,13,13)  per-(host,target) top-Hessian cells (+ b column)
  H_sc  (D,D), b_sc    the point-marginalized Schur complement
  v     (D,P)          absolute cross columns (for resubstitution)
  Hdd/HdiF/bd/has_res  per-point idepth-block quantities
  energy/energy_raw/new_state (F,P)  for thresholds + residual states

The image-tap gather itself stays in XLA (random access into the (F,H,W)
stack lowers to one fused 4-corner take — measured fast; random HBM reads
from inside a Pallas kernel would serialize into per-tap DMAs). Host-row
lookups (R0[host], adjoints, thresholds) become one-hot MXU contractions
inside the kernel — F-fold redundant FLOPs instead of padded gathers, the
same trick as ops/ba_t.py but without the HBM round trips that made the
pure-XLA transposed forms lose.

Numerics: identical algebra to ops/ba.py with a different summation order
(f32 rounding differs at ~1e-6 relative); parity-tested field-by-field in
tests/test_ba_p.py (interpret mode on CPU, compiled on TPU).

Enable on the device path with SOS_SLAM_BA_P=1 (see enabled()).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_t as BT
from sos_slam_tpu.utils.config import CPARS, PATTERN_OFFSETS, Settings

try:  # pltpu only resolves on TPU-capable builds
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

HIGH = jax.lax.Precision.HIGHEST
_NT = (((1,), (1,)), ((), ()))   # contract lanes of both operands (A @ B^T)
_NN = (((1,), (0,)), ((), ()))   # plain (M,K) @ (K,N)


def enabled() -> bool:
    """Use the Pallas fused BA iteration on the device path.

    Default ON for TPU backends — measured head-to-head on the v5e
    (scripts/probe_ba_p.py, scan-chained, P=2048 F=8 VGA window):
    gn_step 7.60 -> 4.81 ms, optimize(<=6 its, converged window)
    14.37 -> 11.26 ms, marginalize_points 6.99 -> 4.41 ms, with identical
    n_active and |state| agreement to 1.3e-7 after a full optimize.
    OFF elsewhere (Mosaic doesn't lower on CPU; tests/test_ba_p.py covers
    parity in interpret mode). Override with SOS_SLAM_BA_P=0/1."""
    v = os.environ.get("SOS_SLAM_BA_P")
    if v is not None:
        return v == "1"
    if pltpu is None:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


class FusedOut(NamedTuple):
    """One fused BA linearization+accumulation (lanes-last outputs)."""

    H_top: jnp.ndarray       # (D,D) stitched top Hessian (no priors)
    b_top: jnp.ndarray       # (D,)
    H_sc: jnp.ndarray        # (D,D) Schur complement
    b_sc: jnp.ndarray        # (D,)
    sc: BT.SchurDataT        # per-point Schur data (vcross is (D,P))
    energy: jnp.ndarray      # (F,P) clamped huber energies
    energy_raw: jnp.ndarray  # (F,P) pre-clamp energies
    new_state: jnp.ndarray   # (F,P) int8 residual states
    active: jnp.ndarray      # (F,P) bool (without the pmask restriction)


def _row_counts(F: int):
    """Row layout of the host-gather matrix (rows contracted against the
    per-point host one-hot inside the kernel)."""
    n_R0 = F * 9
    n_t0 = F * 3
    n_aff = F * 2
    return n_R0, n_t0, n_aff


def _kernel(F: int, P: int, TP: int, use_rz: bool, huber_th: float,
            outlier_comp: float, wlim: float, hlim: float):
    """Build the kernel body (Python closure over the static config)."""
    n_R0, n_t0, n_aff = _row_counts(F)
    o_t0 = n_R0
    o_aff = o_t0 + n_t0
    o_b0 = o_aff + n_aff
    o_th = o_b0 + 1
    o_dp = o_th + 1
    o_adT = o_dp + F * 8
    D = CPARS + 8 * F

    def kernel(big_ref, pp_ref, colw_ref, oh_ref, rm_ref, hostm_ref,
               adh_ref, sm_ref,
               v_ref, srows_ref, eng_ref, eraw_ref, st_ref,
               acc_ref, hsc_ref, bsc_ref):
        step = pl.program_id(0)

        dat = big_ref[:]                              # (F*32, TP)
        hit = dat[:F * 24].reshape(F, 8, 3, TP)
        okx = dat[F * 24:].reshape(F, 8, TP)          # pat_ok & hit_ok (f32)
        pp = pp_ref[:]                                # (8, TP)
        u, v = pp[0], pp[1]
        idep, idz = pp[2], pp[3]
        ptprior, ptv, pmask = pp[4], pp[5], pp[6]
        colw = colw_ref[:]
        color, wpat = colw[:8], colw[8:]              # (8, TP)
        oh = oh_ref[:]                                # (F, TP) host one-hot
        rm = rm_ref[:]
        res_ex, prev_oob = rm[:F], rm[F:]             # (F, TP) f32

        fx, fy, cx, cy = sm_ref[0, 0], sm_ref[0, 1], sm_ref[0, 2], sm_ref[0, 3]
        prior_fac = sm_ref[0, 4]
        shift_flag = sm_ref[0, 5]
        eth = jnp.concatenate(
            [jnp.full((1, TP), sm_ref[1, f]) for f in range(F)], 0)  # (F,TP)
        fv = jnp.concatenate(
            [jnp.full((1, TP), sm_ref[2, f]) for f in range(F)], 0)

        # ---- host-row gather as ONE one-hot contraction ----
        hostg = jax.lax.dot_general(
            hostm_ref[:], oh, _NN, preferred_element_type=jnp.float32,
            precision=HIGH)                            # (rows, TP)
        R0p = hostg[:n_R0].reshape(F, 3, 3, TP)
        t0p = hostg[o_t0:o_aff].reshape(F, 3, TP)
        affp = hostg[o_aff:o_b0].reshape(F, 2, TP)
        b0p = hostg[o_b0]                              # (TP,)
        thh = hostg[o_th]
        dpg = hostg[o_dp:o_adT].reshape(F, 8, TP)      # adHTdelta[host]
        adTp = hostg[o_adT:].reshape(F, 8, 8, TP)      # rows (f, r, i)

        # ---- FEJ center geometry (Residuals.cpp:100-121) ----
        k0 = (u - cx) / fx
        k1 = (v - cy) / fy
        ptp = (R0p[:, :, 0] * k0 + R0p[:, :, 1] * k1 + R0p[:, :, 2]
               + t0p * idz)                            # (F,3,TP)
        drescale = 1.0 / ptp[:, 2]
        u_ = ptp[:, 0] * drescale
        v_ = ptp[:, 1] * drescale
        Ku = u_ * fx + cx
        Kv = v_ * fy + cy
        geo_ok = ((drescale > 0) & (Ku > 1.1) & (Kv > 1.1)
                  & (Ku < wlim) & (Kv < hlim)).astype(jnp.float32)
        new_idepth = idz * drescale

        # d proj / d idepth (F,2,TP)
        Jpdd0 = drescale * (t0p[:, 0] - t0p[:, 2] * u_) * B.SCALE_IDEPTH * fx
        Jpdd1 = drescale * (t0p[:, 1] - t0p[:, 2] * v_) * B.SCALE_IDEPTH * fy

        # d proj / d calib, internal units (Residuals.cpp:122-143)
        Ac = drescale * (R0p[:, 2, 0] * u_ - R0p[:, 0, 0])
        Bc = fx * drescale * (R0p[:, 2, 1] * u_ - R0p[:, 0, 1]) / fy
        Cc = fy * drescale * (R0p[:, 2, 0] * v_ - R0p[:, 1, 0]) / fx
        Dc = drescale * (R0p[:, 2, 1] * v_ - R0p[:, 1, 1])
        idp = new_idepth
        zero = jnp.zeros_like(u_)
        # X rows (F,10,TP) for the x and y image axes
        Xx = jnp.stack(
            [(k0 * Ac + u_) * B.SCALE_F, k1 * Bc * B.SCALE_F,
             (Ac + 1.0) * B.SCALE_C, Bc * B.SCALE_C,
             idp * fx, zero, -idp * u_ * fx,
             -u_ * v_ * fx, (1 + u_ * u_) * fx, -v_ * fx], 1)
        Xy = jnp.stack(
            [k0 * Cc * B.SCALE_F, (k1 * Dc + v_) * B.SCALE_F,
             Cc * B.SCALE_C, (Dc + 1.0) * B.SCALE_C,
             zero, idp * fy, -idp * v_ * fy,
             -(1 + v_ * v_) * fy, u_ * v_ * fy, u_ * fy], 1)

        # ---- residual part at current state (taps gathered in XLA) ----
        hi, gx, gy = hit[:, :, 0], hit[:, :, 1], hit[:, :, 2]   # (F,8,TP)
        r = hi - (affp[:, 0:1] * color[None] + affp[:, 1:2])
        drdA = color[None] - b0p[None, None]
        g2 = gx * gx + gy * gy
        wgrad = jnp.sqrt(outlier_comp / (outlier_comp + g2))
        wgt = 0.5 * (wgrad + wpat[None])
        abs_r = jnp.abs(r)
        hw = jnp.where(abs_r < huber_th, 1.0,
                       huber_th / jnp.maximum(abs_r, 1e-9))
        energy_raw = jnp.sum(wgt * wgt * hw * r * r * (2.0 - hw), 1)  # (F,TP)
        hw2 = jnp.where(hw < 1.0, jnp.sqrt(hw), hw) * wgt
        JIx = gx * hw2
        JIy = gy * hw2
        resF = r * hw2
        Jab0 = drdA * hw2
        Jab1 = hw2
        wJI2 = jnp.sum(hw2 * hw2 * g2, 1)

        ok = okx * geo_ok[:, None]
        allok = jnp.min(ok, 1)                         # (F,TP)
        th = jnp.maximum(thh[None], eth)
        outlier = (energy_raw > th) | (wJI2 < 2.0)
        energy = jnp.where(outlier, th, energy_raw)
        is_oob = (allok < 0.5) | (prev_oob > 0.5)
        new_state = jnp.where(
            is_oob, jnp.float32(B.RES_OOB),
            jnp.where(outlier, jnp.float32(B.RES_OUTLIER),
                      jnp.float32(B.RES_IN)))
        activef = (res_ex * ptv[None] * fv
                   * (new_state == B.RES_IN).astype(jnp.float32))
        m = activef * pmask[None]                      # (F,TP)

        # masked per-residual quantities
        resF = resF * m[:, None]
        JIx = JIx * m[:, None]
        JIy = JIy * m[:, None]
        Jab0 = Jab0 * m[:, None]
        Jab1 = Jab1 * m[:, None]
        Xx = Xx * m[:, None]
        Xy = Xy * m[:, None]
        Jpdd0 = Jpdd0 * m
        Jpdd1 = Jpdd1 * m

        # FEJ shift (fixLinearizationF) for marginalization mode
        if use_rz:
            dd = idep - idz
            dc = [sm_ref[0, 8 + c] for c in range(4)]
            # delta10 rows: [dc(4), dpg[:, :6]]
            Jp0 = (Xx[:, 0] * dc[0] + Xx[:, 1] * dc[1]
                   + Xx[:, 2] * dc[2] + Xx[:, 3] * dc[3])
            Jp1 = (Xy[:, 0] * dc[0] + Xy[:, 1] * dc[1]
                   + Xy[:, 2] * dc[2] + Xy[:, 3] * dc[3])
            for i in range(6):
                Jp0 = Jp0 + Xx[:, 4 + i] * dpg[:, i]
                Jp1 = Jp1 + Xy[:, 4 + i] * dpg[:, i]
            Jp0 = Jp0 + Jpdd0 * dd
            Jp1 = Jp1 + Jpdd1 * dd
            shift = (JIx * Jp0[:, None] + JIy * Jp1[:, None]
                     + Jab0 * dpg[:, 6:7] + Jab1 * dpg[:, 7:8])
            resA = resF - shift
        else:
            resA = resF

        # ---- Schur quantities (AccumulatedSCHessian.cpp:32-79) ----
        a00 = jnp.sum(JIx * JIx, 1)
        a01 = jnp.sum(JIx * JIy, 1)
        a11 = jnp.sum(JIy * JIy, 1)
        Ji2Jp0 = a00 * Jpdd0 + a01 * Jpdd1
        Ji2Jp1 = a01 * Jpdd0 + a11 * Jpdd1
        JIr0 = jnp.sum(JIx * resA, 1)
        JIr1 = jnp.sum(JIy * resA, 1)
        Hdd = jnp.sum(Ji2Jp0 * Jpdd0 + Ji2Jp1 * Jpdd1, 0)        # (TP,)
        bd = jnp.sum(JIr0 * Jpdd0 + JIr1 * Jpdd1, 0)
        Hcd = (Xx[:, :4] * Ji2Jp0[:, None] + Xy[:, :4] * Ji2Jp1[:, None]
               ).sum(0)                                           # (4,TP)
        # JabJIdx rows needed for JpJd
        ab_ji0 = jnp.sum(Jab0 * JIx, 1)
        ab_ji1 = jnp.sum(Jab0 * JIy, 1)
        ab_ji2 = jnp.sum(Jab1 * JIx, 1)
        ab_ji3 = jnp.sum(Jab1 * JIy, 1)
        JpJd = jnp.concatenate(
            [Xx[:, 4:] * Ji2Jp0[:, None] + Xy[:, 4:] * Ji2Jp1[:, None],
             jnp.stack([ab_ji0 * Jpdd0 + ab_ji1 * Jpdd1,
                        ab_ji2 * Jpdd0 + ab_ji3 * Jpdd1], 1)], 1)  # (F,8,TP)

        has_res = (jnp.max(m, 0) > 0.0).astype(jnp.float32)
        Hdd_full = jnp.maximum(Hdd + ptprior * prior_fac, 1e-10)
        HdiF = jnp.where(has_res > 0.5, 1.0 / Hdd_full, 0.0)
        bd_full = bd + shift_flag * ptprior * prior_fac * (idep - idz)

        # absolute cross columns: v = [Hcd, adjoint-stitched frame rows]
        W1 = jax.lax.dot_general(
            adh_ref[:], JpJd.reshape(F * 8, TP), _NN,
            preferred_element_type=jnp.float32, precision=HIGH
        ).reshape(F, 8, TP)                            # rows (h,i)
        vH = jnp.sum(oh[:, None] * W1, 0)              # (8,TP)
        vTf = jnp.sum(adTp * JpJd[:, :, None], 1)      # (F,8,TP)
        vfr = vTf + oh[:, None] * vH[None]
        vfull = jnp.concatenate([Hcd, vfr.reshape(F * 8, TP)], 0)  # (D,TP)

        v_ref[:] = vfull
        srows_ref[:] = jnp.stack([Hdd_full, HdiF, bd_full, has_res])
        eng_ref[:] = energy
        eraw_ref[:] = energy_raw
        st_ref[:] = new_state

        # ---- Schur complement accumulation over tiles ----
        vw = vfull * HdiF[None]
        hsc_blk = jax.lax.dot_general(
            vw, vfull, _NT, preferred_element_type=jnp.float32,
            precision=HIGH)                            # (D,D)
        bsc_blk = jax.lax.dot_general(
            vw, bd_full[None], _NT,
            preferred_element_type=jnp.float32, precision=HIGH)  # (D,1)

        @pl.when(step == 0)
        def _():
            hsc_ref[:] = jnp.zeros_like(hsc_ref)
            bsc_ref[:] = jnp.zeros_like(bsc_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        hsc_ref[:] += hsc_blk
        bsc_ref[:] += bsc_blk.reshape(1, D)

        # ---- top-Hessian cells: rank-13 gram per (host,target) ----
        # Y rows = [X^T JI (10) | Jab (2) | resA (1)]; the host one-hot
        # khatri-rao routes each point's gram into its host block.
        for f in range(F):
            q = (Xx[f][:, None, :] * JIx[f][None, :, :]
                 + Xy[f][:, None, :] * JIy[f][None, :, :])   # (10,8,TP)
            acc_f = jnp.zeros((F * 13, 13), jnp.float32)
            for k in range(8):
                Yk = jnp.concatenate(
                    [q[:, k], Jab0[f, k][None], Jab1[f, k][None],
                     resA[f, k][None]], 0)                   # (13,TP)
                Bm = (oh[:, None, :] * Yk[None, :, :]).reshape(F * 13, TP)
                acc_f = acc_f + jax.lax.dot_general(
                    Bm, Yk, _NT, preferred_element_type=jnp.float32,
                    precision=HIGH)                          # (F*13,13)
            acc_ref[:, f] += acc_f.reshape(F, 13, 13)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("settings", "w", "h", "use_rz",
                              "shift_prior_to_zero", "interpret"))
def fused_iteration(ba: B.BAState, pre: B.Precalc, dI: jnp.ndarray,
                    settings: Settings, w: int, h: int,
                    pmask: jnp.ndarray | None = None,
                    use_rz: bool = False,
                    shift_prior_to_zero: bool = True,
                    prior_fac: float | jnp.ndarray = 1.0,
                    interpret: bool = False) -> FusedOut:
    """One fused linearize+accumulate pass over the (P,F) residual grid.

    Replaces linearize -> accumulate_top -> accumulate_schur -> schur_Hb
    (and, with use_rz=True, the res_to_zero marginalization variant) with
    one XLA tap-gather + one Pallas kernel. See module docstring.
    """
    F, P = ba.F, ba.P
    D = CPARS + 8 * F
    if not interpret:
        try:
            if pltpu is None or jax.default_backend() not in ("tpu", "axon"):
                interpret = True   # Mosaic only lowers on TPU
        except Exception:  # pragma: no cover
            interpret = True
    # interpret mode traces the grid as an unrolled loop — one big tile
    # keeps the graph (and XLA:CPU compile time) small; on TPU the tile is
    # sized for VMEM.
    TP = P if interpret else min(P, 512)
    if P % TP != 0:
        raise ValueError(f"P={P} not divisible by tile {TP}")
    if F > 16:
        # the SMEM scalar buffer packs energy_th / frame_valid into
        # (4,16) rows; beyond 16 frames sm.at[1,:F] would silently clip
        raise ValueError(f"fused_iteration supports F<=16 frames, got {F}")
    fx, fy, cx, cy = jnp.asarray(B.calib_real(ba))
    pat = jnp.asarray(PATTERN_OFFSETS, jnp.float32)
    onehot = jax.nn.one_hot(ba.host, F, dtype=jnp.float32)   # (P,F)

    # ---- current-state pattern projection + tap gather (XLA) ----
    # host rows of pre.R/pre.t via one-hot matmul (no padded gather)
    Rc = jnp.einsum("ph,hx->px", onehot, pre.R.reshape(F, F * 9),
                    precision=HIGH).reshape(P, F, 3, 3)
    tc = jnp.einsum("ph,hx->px", onehot, pre.t.reshape(F, F * 3),
                    precision=HIGH).reshape(P, F, 3)
    up = ba.u[:, None] + pat[None, :, 0]                     # (P,8)
    vp = ba.v[:, None] + pat[None, :, 1]
    KliPp = jnp.stack(
        [(up - cx) / fx, (vp - cy) / fy, jnp.ones_like(up)], -1)  # (P,8,3)
    ptp_c = (jnp.einsum("pfij,pkj->pfki", Rc, KliPp, precision=HIGH)
             + tc[:, :, None, :] * ba.idepth[:, None, None, None])
    z = ptp_c[..., 2]
    pat_ok = z > 1e-6
    Kup = ptp_c[..., 0] / z * fx + cx
    Kvp = ptp_c[..., 1] / z * fy + cy
    pat_ok &= (Kup > 1.1) & (Kvp > 1.1) & (Kup < w - 3) & (Kvp < h - 3)
    hit = _take_taps(dI, Kup, Kvp)                           # (P,F,8,3)
    okf = (pat_ok & jnp.isfinite(hit[..., 0])).astype(jnp.float32)

    # ---- pack kernel inputs (lanes-last) ----
    big0 = jnp.concatenate(
        [jnp.transpose(hit, (1, 2, 3, 0)).reshape(F * 24, P),
         jnp.transpose(okf, (1, 2, 0)).reshape(F * 8, P)], 0)
    if pmask is None:
        pmaskf = jnp.ones((P,), jnp.float32)
    else:
        pmaskf = pmask.astype(jnp.float32)
    ppack = jnp.stack(
        [ba.u, ba.v, ba.idepth, ba.idepth_zero, ba.pt_prior,
         ba.pt_valid.astype(jnp.float32), pmaskf,
         jnp.zeros((P,), jnp.float32)], 0)                   # (8,P)
    colw = jnp.concatenate([ba.color.T, ba.weight.T], 0)     # (16,P)
    ohT = onehot.T                                           # (F,P)
    resmask = jnp.concatenate(
        [ba.res_exist.T.astype(jnp.float32),
         (ba.res_state.T == B.RES_OOB).astype(jnp.float32)], 0)  # (2F,P)

    hostm = jnp.concatenate(
        [jnp.transpose(pre.R0, (1, 2, 3, 0)).reshape(F * 9, F),
         jnp.transpose(pre.t0, (1, 2, 0)).reshape(F * 3, F),
         jnp.transpose(pre.affLL, (1, 2, 0)).reshape(F * 2, F),
         pre.b0[None, :],
         ba.energy_th[None, :],
         jnp.transpose(pre.adHTdelta, (1, 2, 0)).reshape(F * 8, F),
         jnp.transpose(pre.adTarget, (1, 2, 3, 0)).reshape(F * 64, F)],
        0)                                                   # (178+8F^2? ,F)
    adh_ri = jnp.transpose(pre.adHost, (0, 3, 1, 2)).reshape(F * 8, F * 8)

    sm = jnp.zeros((4, 16), jnp.float32)
    sm = sm.at[0, 0:4].set(jnp.stack([fx, fy, cx, cy]))
    sm = sm.at[0, 4].set(jnp.asarray(prior_fac, jnp.float32))
    sm = sm.at[0, 5].set(jnp.float32(1.0 if shift_prior_to_zero else 0.0))
    sm = sm.at[0, 8:12].set(ba.c - ba.c_zero)
    sm = sm.at[1, :F].set(ba.energy_th)
    sm = sm.at[2, :F].set(ba.frame_valid.astype(jnp.float32))

    kern = _kernel(F, P, TP, use_rz, float(settings.huber_th),
                   float(settings.outlier_th_sum_component),
                   float(w - 3), float(h - 3))
    grid = (P // TP,)
    mem = {} if (interpret or _VMEM is None) else dict(memory_space=_VMEM)
    smem = {} if (interpret or _SMEM is None) else dict(memory_space=_SMEM)

    def tiled(rows):
        return pl.BlockSpec((rows, TP), lambda i: (0, i), **mem)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n, **mem)

    out_shape = (
        jax.ShapeDtypeStruct((D, P), jnp.float32),          # vcross
        jax.ShapeDtypeStruct((4, P), jnp.float32),          # srows
        jax.ShapeDtypeStruct((F, P), jnp.float32),          # energy
        jax.ShapeDtypeStruct((F, P), jnp.float32),          # energy_raw
        jax.ShapeDtypeStruct((F, P), jnp.float32),          # new_state
        jax.ShapeDtypeStruct((F, F, 13, 13), jnp.float32),  # acc
        jax.ShapeDtypeStruct((D, D), jnp.float32),          # H_sc
        jax.ShapeDtypeStruct((1, D), jnp.float32),          # b_sc
    )
    out_specs = (
        tiled(D), tiled(4), tiled(F), tiled(F), tiled(F),
        full((F, F, 13, 13)), full((D, D)), full((1, D)),
    )
    in_specs = [
        tiled(F * 32), tiled(8), tiled(16), tiled(F), tiled(2 * F),
        full(hostm.shape), full(adh_ri.shape),
        pl.BlockSpec(sm.shape, lambda i: (0, 0), **smem),
    ]
    v, srows, energy, energy_raw, stf, acc, H_sc, b_sc = pl.pallas_call(
        kern, grid=grid, out_shape=out_shape, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret,
    )(big0, ppack, colw, ohT, resmask, hostm, adh_ri, sm)

    H_top, b_top = B.stitch_acc(ba, pre, acc[..., :12, :12],
                                acc[..., :12, 12])
    new_state = stf.astype(jnp.int8)
    active = (ba.res_exist.T & ba.pt_valid[None, :]
              & ba.frame_valid[:, None] & (new_state == B.RES_IN))
    sc = BT.SchurDataT(Hdd=srows[0], HdiF=srows[1], bd=srows[2],
                       vcross=v, has_res=srows[3] > 0.5)
    return FusedOut(H_top=H_top, b_top=b_top, H_sc=H_sc,
                    b_sc=b_sc.reshape(D), sc=sc, energy=energy,
                    energy_raw=energy_raw, new_state=new_state,
                    active=active)


# ----------------------------------------------------------------------
# activation-GN pass reduce (optimizeImmaturePoint inner loop,
# src/FullSystem/ImmaturePoint.cpp linearizeResidual): fuses the
# post-gather residual/Huber/energy/d_id math + live-masked reductions of
# one 1-DoF GN pass into one kernel. The projection + tap gather stay in
# XLA (same reasoning as fused_iteration).
# ----------------------------------------------------------------------


def _act_kernel(F: int, TN: int, clamp: bool, huber_th: float):
    def kernel(big_ref, colw_ref, ap_ref, oob_ref, eth_ref,
               eres_ref, oob_o_ref, srows_ref):
        dat = big_ref[:].reshape(F, 8, 6, TN)
        hi, gx, gy = dat[:, :, 0], dat[:, :, 1], dat[:, :, 2]
        a, b, okf = dat[:, :, 3], dat[:, :, 4], dat[:, :, 5]
        colw = colw_ref[:]
        color, w2 = colw[:8], colw[8:]                # (8,TN); w2 = weights^2
        ap = ap_ref[:].reshape(F, 2, TN)
        oob_in = oob_ref[:]                            # (F,TN) f32
        eth = eth_ref[:]                               # (1,TN)

        r = hi - (ap[:, 0:1] * color[None] + ap[:, 1:2])
        ar = jnp.abs(r)
        hw = jnp.where(ar < huber_th, 1.0,
                       huber_th / jnp.maximum(ar, 1e-9))
        e_res = jnp.sum(w2[None] * hw * r * r * (2.0 - hw), 1)   # (F,TN)
        d_id = gx * a + gy * b
        hww = hw * w2[None]
        Hdd = jnp.sum(hww * d_id * d_id, 1)
        bd = jnp.sum(hww * r * d_id, 1)

        allok = jnp.min(okf, 1)                        # (F,TN)
        oob_out = jnp.maximum(oob_in, (allok < 0.5).astype(jnp.float32))
        live = oob_out < 0.5
        ec = jnp.minimum(e_res, eth) if clamp else e_res
        eres_ref[:] = e_res
        oob_o_ref[:] = oob_out
        # where (not multiply): dead rows can hold NaN taps — 0*NaN = NaN
        srows_ref[:] = jnp.stack([
            jnp.sum(jnp.where(live, ec, 0.0), 0),
            jnp.sum(jnp.where(live, Hdd, 0.0), 0),
            jnp.sum(jnp.where(live, bd, 0.0), 0)])

    return kernel


@functools.partial(jax.jit, static_argnames=("clamp", "huber_th",
                                             "interpret"))
def act_pass(hit: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
             okf: jnp.ndarray, color: jnp.ndarray, weights2: jnp.ndarray,
             ap: jnp.ndarray, oob_in: jnp.ndarray, energy_th: jnp.ndarray,
             clamp: bool, huber_th: float, interpret: bool = False):
    """One activation-GN pass reduce.

    hit (N,F,8,3) gathered taps; a/b (N,F,8) the d_id chain-rule factors
    (fx*drescale*(t0 - t2*u), fy*drescale*(t1 - t2*v)); okf (N,F,8) f32
    projection+finite mask; color (N,8); weights2 (N,8) squared pattern
    weights; ap (N,F,2) affine transfer; oob_in (N,F) f32; energy_th (N,).

    Returns (e_res (N,F) unclamped, oob_out (N,F) f32, eN, HN, bN (N,))
    with eN/HN/bN live-masked sums over frames (eN clamped at energy_th
    when clamp=True — gn_body's outlierTHSlack=1 branch)."""
    N, F = hit.shape[0], hit.shape[1]
    if not interpret:
        try:
            if pltpu is None or jax.default_backend() not in ("tpu", "axon"):
                interpret = True
        except Exception:  # pragma: no cover
            interpret = True
    TN = N if interpret else min(N, 512)
    if N % TN != 0:
        raise ValueError(f"N={N} not divisible by tile {TN}")

    big = jnp.stack([hit[..., 0], hit[..., 1], hit[..., 2], a, b, okf], -1)
    bigT = jnp.transpose(big, (1, 2, 3, 0)).reshape(F * 48, N)
    colw = jnp.concatenate([color.T, weights2.T], 0)          # (16,N)
    apT = jnp.transpose(ap, (1, 2, 0)).reshape(F * 2, N)
    oobT = oob_in.T                                           # (F,N)
    ethT = energy_th[None, :]                                 # (1,N)

    mem = {} if (interpret or _VMEM is None) else dict(memory_space=_VMEM)

    def tiled(rows):
        return pl.BlockSpec((rows, TN), lambda i: (0, i), **mem)

    eres, oob_o, srows = pl.pallas_call(
        _act_kernel(F, TN, clamp, float(huber_th)),
        grid=(N // TN,),
        out_shape=(
            jax.ShapeDtypeStruct((F, N), jnp.float32),
            jax.ShapeDtypeStruct((F, N), jnp.float32),
            jax.ShapeDtypeStruct((3, N), jnp.float32),
        ),
        in_specs=[tiled(F * 48), tiled(16), tiled(F * 2), tiled(F),
                  tiled(1)],
        out_specs=(tiled(F), tiled(F), tiled(3)),
        interpret=interpret,
    )(bigT, colw, apT, oobT, ethT)
    return eres.T, oob_o.T, srows[0], srows[1], srows[2]


def _take_taps(dI: jnp.ndarray, Kup: jnp.ndarray, Kvp: jnp.ndarray
               ) -> jnp.ndarray:
    """The fused 4-corner bilinear take over the flattened (F*H*W, C)
    plane — identical to ops/ba.py::linearize's gather (see the
    interp_bilinear_frames notes there)."""
    F, H, W = dI.shape[0], dI.shape[1], dI.shape[2]
    flat = dI.reshape(F * H * W, -1)
    x0 = jnp.clip(jnp.floor(Kup), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(Kvp), 0, H - 2).astype(jnp.int32)
    dx = jnp.clip(Kup - x0, 0.0, 1.0)[..., None]
    dy = jnp.clip(Kvp - y0, 0.0, 1.0)[..., None]
    fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]
    idx = fofs + y0 * W + x0
    # one stacked-corner take (see image.interp_bilinear_frames)
    idx4 = jnp.stack([idx, idx + 1, idx + W, idx + W + 1], 0)
    c = jnp.take(flat, idx4, axis=0)
    return (c[0] * (1 - dx) * (1 - dy) + c[1] * dx * (1 - dy)
            + c[2] * (1 - dx) * dy + c[3] * dx * dy)
