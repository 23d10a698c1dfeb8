"""Benchmark: end-to-end tracked frames/sec of the odometry pipeline.

Runs the full system (initializer -> tracker -> keyframes -> windowed BA ->
marginalization) on a synthetic 640x480 sequence (EuRoC-class resolution,
analytic multi-view-consistent scene — no dataset dependency), measures
steady-state throughput after a compile/warmup phase, and prints ONE JSON
line.

Baseline contract (BASELINE.json): >= 2x camera rate (EuRoC = 20 fps) on one
TPU v5e chip => vs_baseline = fps / 40.0 (>= 1.0 means target met).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sos_slam_tpu.models.full_system import FullSystem
    from sos_slam_tpu.utils import synthetic
    from sos_slam_tpu.utils.config import default_settings

    W, H = 640, 480
    N_FRAMES = 48
    # warmup must cover the first frame marginalization (window fill) so all
    # program variants are compiled before the timed window starts
    WARMUP = 26

    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, poses = synthetic.make_sequence(calib, N_FRAMES, twist,
                                             plane_z=2.0)
    imgs = jax.block_until_ready(imgs)

    settings = default_settings()
    fs = FullSystem(calib, settings)

    verbose = os.environ.get("SOS_BENCH_VERBOSE", "0") == "1"
    frame_times = []
    kf_flags = []
    t_start = time.time()
    for i in range(N_FRAMES):
        if verbose:
            print(f"[bench] frame {i} t={time.time()-t_start:.1f}s",
                  file=sys.stderr, flush=True)
        if i == WARMUP:
            # pre-dispatch rare program variants (tracker fallbacks,
            # selector-potential rungs) so no compile / executable-cache
            # load lands inside the timed window
            fs.prewarm()
        n_kf_before = fs.stats["n_kf"]
        t0 = time.time()
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        jax.block_until_ready(fs.ba.state)
        frame_times.append(time.time() - t0)
        kf_flags.append(fs.stats["n_kf"] > n_kf_before)
        if fs.is_lost or fs.init_failed:
            break

    ok = not (fs.is_lost or fs.init_failed) and fs.initialized
    steady = frame_times[WARMUP:]
    if ok and len(steady) >= 5:
        fps = len(steady) / sum(steady)
        kf_ms = [1000.0 * t for t, k in zip(frame_times[WARMUP:],
                                            kf_flags[WARMUP:]) if k]
        kf_ba_ms = float(np.median(kf_ms)) if kf_ms else -1.0
    else:
        fps = 0.0
        kf_ba_ms = -1.0

    # trajectory sanity: scale-aligned ATE must stay small, else report 0
    try:
        traj = fs.trajectory()
        ids = traj[:, 0].astype(int)
        est, gt = traj[:, 1:4], np.asarray(poses)[ids, :3, 3]
        en, gn = np.linalg.norm(est, axis=1), np.linalg.norm(gt, axis=1)
        nz = gn > 1e-6
        scale = np.median(en[nz] / gn[nz]) if nz.any() else 1.0
        ate = float(np.sqrt(np.mean(
            np.linalg.norm(est / max(scale, 1e-9) - gt, axis=1) ** 2)))
        path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
        if ate > 0.05 * path + 0.02:
            fps = 0.0   # fast-but-wrong doesn't count
    except Exception:
        ate, path = -1.0, -1.0

    # second scene at a realistic (~10%) keyframe cadence: the primary
    # scene's motion forces ~46% keyframes, which over-weights the KF path;
    # real EuRoC sequences keyframe every ~10 frames. Same resolution, so
    # every compiled program is reused — only execution is measured.
    lo_fps, lo_kf, lo_frames = -1.0, 0, 0
    if ok and fps > 0:
        twist2 = jnp.array([0.006, 0.0024, 0.004, 0.0004, 0.0008, 0.0002])
        imgs2, _, _ = synthetic.make_sequence(calib, N_FRAMES, twist2,
                                              plane_z=2.0)
        imgs2 = jax.block_until_ready(imgs2)
        fs2 = FullSystem(calib, settings)
        t2 = []
        for i in range(N_FRAMES):
            t0 = time.time()
            fs2.add_active_frame(imgs2[i], timestamp=i * 0.05, frame_id=i)
            jax.block_until_ready(fs2.ba.state)
            t2.append(time.time() - t0)
            if fs2.is_lost or fs2.init_failed:
                break
        fs2.finish_pending()
        W2 = 14   # init finishes well before; no fresh compiles expected
        if not (fs2.is_lost or fs2.init_failed) and len(t2) == N_FRAMES:
            lo_fps = (N_FRAMES - W2) / sum(t2[W2:])
            lo_kf, lo_frames = fs2.stats["n_kf"], fs2.stats["n_frames"]

    print(json.dumps({
        "metric": "tracked_fps_synthetic_640x480_full_pipeline",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 40.0, 4),
        "extra": {
            "kf_ba_ms_median": round(kf_ba_ms, 1),
            "n_kf": fs.stats["n_kf"],
            "n_frames": fs.stats["n_frames"],
            "ate_m": round(ate, 4),
            "path_m": round(path, 3),
            "fps_low_cadence": round(lo_fps, 3),
            "n_kf_low_cadence": lo_kf,
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
