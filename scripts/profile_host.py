"""Host-vs-device split of the bench loop, via cProfile + per-frame timers.

Runs the same pipeline as bench.py for N frames and reports:
  * per-frame wall time, split KF vs non-KF;
  * cProfile top-30 cumulative functions (host cost incl. RPC waits);
so we can see whether the 1-core host or the device path dominates.
"""

import cProfile
import io
import os
import pstats
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

    W, H = 640, 480
    N = 44
    WARM = 26
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, poses = synthetic.make_sequence(calib, N, twist, plane_z=2.0)
    imgs = jax.block_until_ready(imgs)

    settings = default_settings()
    fs = FullSystem(calib, settings)

    for i in range(WARM):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    jax.block_until_ready(fs.ba.state)
    print("warm:", fs.stats, flush=True)

    pr = cProfile.Profile()
    times = []
    kfs = []
    pr.enable()
    for i in range(WARM, N):
        nk = fs.stats["n_kf"]
        t0 = time.perf_counter()
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        jax.block_until_ready(fs.ba.state)
        times.append(time.perf_counter() - t0)
        kfs.append(fs.stats["n_kf"] > nk)
    pr.disable()

    tt = np.array(times)
    kk = np.array(kfs)
    print(f"frames={len(tt)} kf={kk.sum()}  "
          f"nonKF ms: med={np.median(tt[~kk])*1e3:.0f} "
          f"mean={tt[~kk].mean()*1e3:.0f}  "
          f"KF ms: med={np.median(tt[kk])*1e3:.0f} "
          f"mean={tt[kk].mean()*1e3:.0f}", flush=True)
    print("per-frame ms:", " ".join(
        f"{'K' if k else '.'}{t*1e3:.0f}" for t, k in zip(tt, kk)))

    s = io.StringIO()
    st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    st.print_stats(35)
    print(s.getvalue()[:7000])


if __name__ == "__main__":
    main()
