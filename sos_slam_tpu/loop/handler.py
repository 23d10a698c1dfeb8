"""LoopHandler: place recognition + pose-graph backend.

TPU-native rebuild of src/LoopClosure/LoopHandler.{h,cpp}: consumes
marginalized keyframes from the odometry front-end (hooked as a publisher
callback, the same decoupling seam as the reference's Output3DWrapper),
assembles the imitated-LiDAR scan, matches Scan Context descriptors,
verifies candidates by direct alignment then ICP, and maintains the SE(3)
pose graph (odometry edges weighted by dso_error/scale_error).

Pose-graph optimization runs only when a loop edge is added — without loop
edges the graph is a chain with its last vertex fixed, whose optimum is the
odometry itself (the reference optimizes every frame with incremental g2o;
the fixed point is identical).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.utils.hostio import fetch

from sos_slam_tpu.loop import pose_estimator as PE
from sos_slam_tpu.loop import pose_graph as PG
from sos_slam_tpu.loop import scancontext as SC
from sos_slam_tpu.utils.config import Settings

DSO_ERROR_SCALE = 5.0
SCALE_ERROR_SCALE = 0.1
DIRECT_ERROR_SCALE = 0.1
ICP_ERROR_SCALE = 1.0
MAX_LOOP_PTS = 2048


class LoopHandler:
    def __init__(self, settings: Settings, intrinsics, n_levels: int,
                 ringkey_margin: int = SC.LOOP_MARGIN):
        self.settings = settings
        self.intrinsics = intrinsics
        self.n_levels = n_levels
        self.enable = settings.enable_loop_closure
        self.accum = SC.ScanAccumulator(settings.loop_lidar_range,
                                        settings.enable_imu) \
            if self.enable else None
        self.ringkeys = SC.RingkeyIndex(margin=ringkey_margin)
        self.frames: List[dict] = []       # one record per marginalized KF
        self.n_loop_edges = 0
        self.n_direct = 0
        self.n_icp = 0
        self.timing: Dict[str, List[float]] = dict(
            scan=[], ringkey=[], sc=[], direct=[], icp=[], graph=[])

    # ------------------------------------------------------------------
    def on_keyframe(self, rec: dict):
        """rec: dict from FullSystem._export_kf with keys
        shell, pts_uvdi (M,3) [u,v,idepth_metric], intensities (M,L),
        pyramid (levels tuple), dso_error, scale_error."""
        import time as _time
        sh = rec["shell"]
        T_wc = np.asarray(
            sh.cam_to_world_scaled if sh.cam_to_world_scaled is not None
            else sh.cam_to_world, np.float64)

        frame = dict(
            kf_id=len(self.frames), incoming_id=sh.id, shell=sh,
            T_wc=T_wc.copy(), T_opt=T_wc.copy(),
            edges=[], sig=None, pts_sc=np.zeros((0, 3)),
            T_sc_rig=np.eye(4), pyramid=rec.get("pyramid"),
            dso_error=rec.get("dso_error", np.nan),
            scale_error=rec.get("scale_error", -1.0),
            intensities=rec.get("intensities"),
            pts_cam=None,
        )

        # odometry edge to the previous KF (LoopHandler.cpp:236-244)
        if self.frames:
            prv = self.frames[-1]
            T_prv_cur = np.linalg.inv(prv["T_wc"]) @ T_wc
            dso_err = frame["dso_error"]
            if np.isfinite(dso_err):
                info = PG.edge_information(
                    max(DSO_ERROR_SCALE * dso_err, 1e-9),
                    SCALE_ERROR_SCALE * frame["scale_error"])
                frame["edges"].append(dict(
                    id_from=prv["kf_id"], T_from_to=T_prv_cur,
                    info=np.asarray(info)))
        self.frames.append(frame)

        if not self.enable or frame["scale_error"] < 0:
            return

        pts_uvdi = rec.get("pts_uvdi")
        if pts_uvdi is None or len(pts_uvdi) == 0:
            return
        fx, fy, cx, cy = self.intrinsics[0]
        d = np.maximum(pts_uvdi[:, 2], 1e-6)
        pts_cam = np.stack([
            (pts_uvdi[:, 0] - cx) / fx / d,
            (pts_uvdi[:, 1] - cy) / fy / d,
            1.0 / d], -1)
        frame["pts_cam"] = pts_cam

        t0 = _time.time()
        if self.settings.loop_cam_mode == "downward":
            pts_sc, T_sc_rig = SC.process_scan_downward(
                T_wc, pts_cam, self.settings.loop_lidar_range,
                self.settings.enable_imu)
        else:
            pts_sc, T_sc_rig = self.accum.process(frame["kf_id"], T_wc,
                                                  pts_cam)
        frame["pts_sc"] = pts_sc
        frame["T_sc_rig"] = T_sc_rig
        sig, ringkey, usable = SC.generate(
            pts_sc, T_sc_rig, self.settings.loop_lidar_range)
        frame["sig"] = sig
        self.timing["scan"].append(_time.time() - t0)
        if not usable:
            self.ringkeys.search_and_insert(ringkey * 0 + 1e9)  # keep margin
            return

        t0 = _time.time()
        cands = self.ringkeys.search_and_insert(ringkey)
        self.timing["ringkey"].append(_time.time() - t0)
        cands = [c for c in cands if self.frames[c]["sig"] is not None]
        if not cands:
            return

        t0 = _time.time()
        mi, diff = SC.search_sc(sig, cands, [f["sig"] for f in self.frames])
        self.timing["sc"].append(_time.time() - t0)
        if diff >= self.settings.scan_context_thres:
            return

        matched = self.frames[mi]
        self._verify_and_close(frame, matched)

    # ------------------------------------------------------------------
    def _verify_and_close(self, frame, matched):
        import time as _time
        s = self.settings
        T_cur_matched0 = np.linalg.inv(frame["T_sc_rig"]) @ matched["T_sc_rig"]

        ok = False
        pose_error = np.inf
        T_cm = T_cur_matched0

        # direct photometric verification
        if frame.get("pyramid") is not None and \
                matched.get("pts_cam") is not None and \
                matched.get("intensities") is not None:
            t0 = _time.time()
            pts, inten, valid = _pad_points(
                matched["pts_cam"], matched["intensities"])
            T_est, okd, rms = PE.estimate_direct(
                frame["pyramid"], jnp.asarray(pts), jnp.asarray(inten),
                jnp.asarray(valid),
                jnp.asarray(T_cur_matched0, jnp.float32),
                self.intrinsics, self.n_levels, s.loop_direct_thres)
            T_est, okd, rms = fetch((T_est, okd, rms))
            self.timing["direct"].append(_time.time() - t0)
            if bool(okd) and not s.loop_force_icp:
                ok = True
                T_cm = np.asarray(T_est, np.float64)
                pose_error = float(rms) * DIRECT_ERROR_SCALE
                self.n_direct += 1

        if not ok and matched["pts_sc"].shape[0] > 8 \
                and frame["pts_sc"].shape[0] > 8:
            t0 = _time.time()
            pr, vr = _pad_cloud(matched["pts_sc"])
            pc, vc = _pad_cloud(frame["pts_sc"])
            T_icp, oki, err = PE.icp(
                jnp.asarray(pr), jnp.asarray(vr), jnp.asarray(pc),
                jnp.asarray(vc), jnp.asarray(T_cm, jnp.float32))
            T_icp, oki, err = fetch((T_icp, oki, err))
            self.timing["icp"].append(_time.time() - t0)
            if bool(oki) and float(err) < s.loop_icp_thres:
                ok = True
                T_cm = np.asarray(T_icp, np.float64)
                pose_error = float(err) * ICP_ERROR_SCALE
                self.n_icp += 1

        if not ok:
            return

        # loop edge: measurement maps matched -> cur (T_matched_cur)
        info = PG.edge_information(
            max(pose_error, 1e-9),
            SCALE_ERROR_SCALE * matched["scale_error"])
        frame["edges"].append(dict(
            id_from=matched["kf_id"], T_from_to=np.linalg.inv(T_cm),
            info=np.asarray(info)))
        self.n_loop_edges += 1
        self._optimize_graph()

    # ------------------------------------------------------------------
    def _optimize_graph(self):
        import time as _time
        t0 = _time.time()
        n = len(self.frames)
        N = 1 << max(4, (n - 1).bit_length())
        T = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
        for i, f in enumerate(self.frames):
            T[i] = f["T_opt"]
        v_valid = np.arange(N) < n
        fixed = ~v_valid
        fixed[n - 1] = True          # fix the newest vertex
        # frames with NaN dso_error start new sequences: fix them too
        edges = []
        for f in self.frames:
            for e in f["edges"]:
                edges.append((e["id_from"], f["kf_id"], e["T_from_to"],
                              e["info"]))
        if not edges:
            return
        E = 1 << max(4, (len(edges) - 1).bit_length())
        e_from = np.zeros(E, np.int32)
        e_to = np.zeros(E, np.int32)
        e_meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        e_info = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
        e_valid = np.zeros(E, bool)
        for i, (a, b, m, info) in enumerate(edges):
            e_from[i], e_to[i] = a, b
            e_meas[i] = m
            e_info[i] = info
            e_valid[i] = True

        T_out = PG.optimize_pose_graph(
            jnp.asarray(T), jnp.asarray(v_valid), jnp.asarray(fixed),
            jnp.asarray(e_from), jnp.asarray(e_to), jnp.asarray(e_meas),
            jnp.asarray(e_info), jnp.asarray(e_valid))
        T_out = np.asarray(fetch(T_out), np.float64)
        for i, f in enumerate(self.frames):
            f["T_opt"] = T_out[i]
        self.timing["graph"].append(_time.time() - t0)

    # ------------------------------------------------------------------
    def save_poses(self, path: str, fmt: str = "id_xyz"):
        """poses.txt contract: `incoming_id x y z` per KF
        (LoopHandler::savePose, LoopHandler.cpp:62-76). fmt="tum" writes
        `timestamp tx ty tz qx qy qz qw` for TUM evaluation tools."""
        with open(path, "w") as f:
            for fr in self.frames:
                T = fr["T_opt"]
                t = T[:3, 3]
                if fmt == "tum":
                    q = _rot_to_quat(T[:3, :3])
                    f.write(f"{fr['shell'].timestamp:.6f} "
                            f"{t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")
                else:
                    f.write(f"{fr['incoming_id']} {t[0]:.6f} {t[1]:.6f} "
                            f"{t[2]:.6f}\n")

    def trajectory(self) -> np.ndarray:
        return np.array([[f["incoming_id"], *f["T_opt"][:3, 3]]
                         for f in self.frames])


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) from a rotation matrix."""
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 0.0)) / 2.0
    if w > 1e-6:
        return np.array([w, (R[2, 1] - R[1, 2]) / (4 * w),
                         (R[0, 2] - R[2, 0]) / (4 * w),
                         (R[1, 0] - R[0, 1]) / (4 * w)])
    # fallback for w ~ 0
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 0.5
    q = np.zeros(4)
    q[1 + i] = s
    q[0] = (R[k, j] - R[j, k]) / (4 * s)
    q[1 + j] = (R[j, i] + R[i, j]) / (4 * s)
    q[1 + k] = (R[k, i] + R[i, k]) / (4 * s)
    return q


def _pad_points(pts: np.ndarray, inten: np.ndarray):
    n = min(len(pts), MAX_LOOP_PTS)
    P = np.zeros((MAX_LOOP_PTS, 3), np.float32)
    I = np.zeros((MAX_LOOP_PTS, inten.shape[1]), np.float32)
    V = np.zeros(MAX_LOOP_PTS, bool)
    P[:n] = pts[:n]
    I[:n] = inten[:n]
    V[:n] = True
    return P, I, V


def _pad_cloud(pts: np.ndarray, cap: int = 1024):
    n = min(len(pts), cap)
    P = np.zeros((cap, 3), np.float32)
    V = np.zeros(cap, bool)
    step = max(len(pts) // cap, 1)
    sel = pts[::step][:cap]
    P[:len(sel)] = sel
    V[:len(sel)] = True
    return P, V
