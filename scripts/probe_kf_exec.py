"""Ground-truth device execution time of the REAL fused frame program:
re-dispatches the captured dispatch args of (a) a steady non-keyframe and
(b) a keyframe (need_kf chain taken), back-to-back on the device queue.

Uses the already-compiled production programs (warm cache) — no scan
wrappers, no recompiles. The async dispatches serialize on the device
execution queue; one block at the end gives exec-per-call.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import sos_slam_tpu.models.full_system as fsm
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings


def main():
    W, H = 640, 480
    n = 36
    calib = synthetic.default_calib(W, H)
    settings = default_settings()
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    frames = [jax.block_until_ready(imgs[i]) for i in range(n)]
    fs = FullSystem(calib, settings)

    kf_rec, nonkf_rec = None, None
    orig_complete = fs._complete_fused

    def capture(p):
        nonlocal kf_rec, nonkf_rec
        redo = orig_complete(p)
        if fs._last_frame_was_kf and "dispatch_rec" in p:
            kf_rec = p["dispatch_rec"]
        elif "dispatch_rec" in p:
            nonkf_rec = p["dispatch_rec"]
        return redo

    fs._complete_fused = capture
    for i in range(n):
        fs.add_active_frame(frames[i], timestamp=i * 0.05, frame_id=i)
    fs.finish_pending()
    print(f"n_kf={fs.stats['n_kf']} captured kf={kf_rec is not None} "
          f"nonkf={nonkf_rec is not None}", flush=True)

    def exec_ms(rec, reps=10):
        kind, args, kw = rec
        fn = fsm._fused_frame_vio_jit if kind == "vio" \
            else fsm._fused_frame_mono_jit
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args, **kw)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps * 1000.0

    if nonkf_rec is not None:
        print(f"non-KF frame program exec: {exec_ms(nonkf_rec):7.2f} ms",
              flush=True)
    if kf_rec is not None:
        print(f"KF frame program exec   : {exec_ms(kf_rec):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
