"""Per-frame timing split of the fused driver on the configured platform.

Runs the bench scene SYNCHRONOUSLY (pipeline off) so each frame's fetch
blocks on its own execution: fetch time ~= device exec + transfer RTT.
Prints the keyframe / non-keyframe split — the difference is the keyframe
chain's execution cost inside the merged per-frame program.

Usage: python scripts/profile_fused.py [n_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sos_slam_tpu.models.full_system import FullSystem
    from sos_slam_tpu.utils import synthetic
    from sos_slam_tpu.utils.config import default_settings

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    W, H = 640, 480
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, _ = synthetic.make_sequence(calib, n_frames, twist, plane_z=2.0)
    imgs = jax.block_until_ready(imgs)

    fs = FullSystem(calib, default_settings())
    fs.pipeline = False

    rows = []  # (frame, was_kf, dispatch_ms, fetch_ms, host_ms)
    for i in range(n_frames):
        n_kf0 = fs.stats["n_kf"]
        td0 = fs.telemetry.timers.get("fused_dispatch")
        tf0 = fs.telemetry.timers.get("fused_fetch")
        nd0 = len(td0) if td0 else 0
        nf0 = len(tf0) if tf0 else 0
        t0 = time.time()
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        wall = (time.time() - t0) * 1000.0
        td = fs.telemetry.timers.get("fused_dispatch", [])
        tf = fs.telemetry.timers.get("fused_fetch", [])
        d_ms = sum(td[nd0:]) if len(td) > nd0 else -1.0
        f_ms = sum(tf[nf0:]) if len(tf) > nf0 else -1.0
        rows.append((i, fs.stats["n_kf"] > n_kf0, d_ms, f_ms,
                     wall - max(d_ms, 0) - max(f_ms, 0)))
        if fs.is_lost or fs.init_failed:
            print("LOST/FAILED at frame", i)
            break
    fs.finish_pending()

    steady = [r for r in rows if r[0] >= 26 and r[2] >= 0]
    kf = [r for r in rows[26:] if r[1]]
    nk = [r for r in rows[26:] if not r[1]]
    print(f"{'frame':>5} {'kf':>3} {'disp':>8} {'fetch':>8} {'host':>8}")
    for r in steady:
        print(f"{r[0]:>5} {int(r[1]):>3} {r[2]:>8.1f} {r[3]:>8.1f} "
              f"{r[4]:>8.1f}")

    def med(rows, k):
        return float(np.median([r[k] for r in rows])) if rows else -1.0

    print(f"\nnon-KF (n={len(nk)}): dispatch {med(nk, 2):.1f} ms, "
          f"fetch {med(nk, 3):.1f} ms, host {med(nk, 4):.1f} ms")
    print(f"KF     (n={len(kf)}): dispatch {med(kf, 2):.1f} ms, "
          f"fetch {med(kf, 3):.1f} ms, host {med(kf, 4):.1f} ms")
    print(f"=> KF chain exec ~= {med(kf, 3) - med(nk, 3):.1f} ms")
    if fs.stats.get("ba_its"):
        print("BA iterations per KF:", fs.stats["ba_its"])


if __name__ == "__main__":
    main()
