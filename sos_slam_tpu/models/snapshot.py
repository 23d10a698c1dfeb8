"""State snapshot / resume.

The reference has NO checkpointing (SURVEY §5.4 — the only persistent output
is poses.txt at shutdown). This is the optional bonus: dump the full device
state (window, immature pool, IMU state) + host bookkeeping to one .npz and
restore a FullSystem mid-run — deterministic resume is a natural win of the
fixed-shape functional design (every state is already a flat pytree).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models import imu as IM
from sos_slam_tpu.models.full_system import FrameShell, FullSystem
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import trace as TR


def _pack(prefix: str, tup, out: dict):
    for name, val in zip(tup._fields, tup):
        out[f"{prefix}.{name}"] = np.asarray(val)


def _unpack(prefix: str, cls, data) -> object:
    return cls(**{name: jnp.asarray(data[f"{prefix}.{name}"])
                  for name in cls._fields})


def save_snapshot(fs: FullSystem, path: str) -> None:
    # drain in-flight pipelined frames FIRST: fs.ba/imm/imu lag the
    # dispatched frames until their completions are read back
    if hasattr(fs, "finish_pending"):
        fs.finish_pending()
    out: dict = {}
    _pack("ba", fs.ba, out)
    _pack("imm", fs.imm, out)
    if fs.imu is not None:
        _pack("imu", fs.imu, out)
    out["dI"] = np.asarray(fs.dI)
    out["HdiF"] = np.asarray(fs.HdiF)
    for lvl_set, name in ((fs.frame_pyramids, "pyr"),):
        for i, pyr in enumerate(lvl_set):
            if pyr is not None:
                for l, lv in enumerate(pyr):
                    out[f"{name}.{i}.{l}"] = np.asarray(lv)

    host = dict(
        shells=[dataclasses.asdict(s) for s in fs.shells],
        frame_shell_idx=fs.frame_shell_idx,
        kf_shell_ids=fs.kf_shell_ids,
        host_out=fs.host_out.tolist(),
        current_min_act_dist=float(fs.current_min_act_dist),
        sel_pot=int(getattr(fs, "_sel_pot", 3)),
        current_scale=fs.current_scale,
        scale_trapped=fs.scale_trapped,
        scale_opt_fails=fs.scale_opt_fails,
        imu_initialized=fs.imu_initialized,
        initialized=fs.initialized,
        is_lost=fs.is_lost,
        init_failed=fs.init_failed,
        ref_slot=fs.ref_slot,
        ref_exposure=fs.ref_exposure,
        first_coarse_rmse=fs.first_coarse_rmse,
        last_coarse_rmse=fs.last_coarse_rmse.tolist(),
        stats={k: v for k, v in fs.stats.items()},
        marg_pts=[[list(map(float, p)) for p in c]
                  for c in fs._marg_pts_cache],
    )

    def _default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(type(o))

    out["host_json"] = np.frombuffer(
        json.dumps(host, default=_default).encode(), dtype=np.uint8)
    np.savez_compressed(path, **out)


def load_snapshot(fs: FullSystem, path: str) -> FullSystem:
    """Restore state into a freshly-constructed FullSystem (same settings /
    calib). Returns fs (mutated in place)."""
    data = np.load(path)
    fs.ba = _unpack("ba", B.BAState, data)
    fs.imm = _unpack("imm", TR.ImmatureState, data)
    if fs.imu is not None and "imu.state" in data:
        fs.imu = _unpack("imu", IM.ImuState, data)
    fs.dI = jnp.asarray(data["dI"])
    fs.HdiF = jnp.asarray(data["HdiF"])

    host = json.loads(bytes(data["host_json"].tobytes()).decode())
    fs.shells = []
    fs._shell_by_id = {}
    for i, d in enumerate(host["shells"]):
        d = dict(d)
        for k in ("cam_to_world", "aff", "cam_to_world_scaled"):
            if d.get(k) is not None:
                d[k] = np.asarray(d[k])
        d["shell_idx"] = i      # recomputed (absent in older snapshots)
        sh = FrameShell(**d)
        fs.shells.append(sh)
        fs._shell_by_id[sh.id] = sh
    fs.frame_shell_idx = host["frame_shell_idx"]
    fs.kf_shell_ids = host["kf_shell_ids"]
    fs.host_out = np.asarray(host["host_out"], np.int64)
    fs.current_min_act_dist = host["current_min_act_dist"]
    fs._sel_pot = int(host.get("sel_pot", 3))
    fs.current_scale = host["current_scale"]
    fs.scale_trapped = host["scale_trapped"]
    fs.scale_opt_fails = host["scale_opt_fails"]
    fs.imu_initialized = host["imu_initialized"]
    fs.initialized = host["initialized"]
    fs.is_lost = host["is_lost"]
    fs.init_failed = host["init_failed"]
    fs.ref_slot = host["ref_slot"]
    fs.ref_exposure = host["ref_exposure"]
    fs.first_coarse_rmse = host["first_coarse_rmse"]
    fs.last_coarse_rmse = np.asarray(host["last_coarse_rmse"])
    fs.stats.update(host["stats"])
    fs._marg_pts_cache = [[tuple(p) for p in c] for c in host["marg_pts"]]

    n = len(fs.frame_shell_idx)
    fs.frame_pyramids = [None] * fs.F
    for i in range(n):
        lvls = []
        l = 0
        while f"pyr.{i}.{l}" in data:
            lvls.append(jnp.asarray(data[f"pyr.{i}.{l}"]))
            l += 1
        if lvls:
            fs.frame_pyramids[i] = tuple(lvls)
    # rebuild the tracker template from the restored window
    if fs.initialized and fs.frame_pyramids[max(n - 1, 0)] is not None:
        from sos_slam_tpu.models import window as WIN
        fs.templates, fs.pc_l0 = WIN.build_track_template(
            fs.ba, fs.HdiF, fs.frame_pyramids[n - 1], fs.n_levels,
            fs.tmpl_sizes, fs.w, fs.h)
        fs.ref_aff = jnp.asarray(fs.shells[fs.frame_shell_idx[n - 1]].aff,
                                 jnp.float32)
    return fs
