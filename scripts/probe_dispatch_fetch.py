"""Isolate the steady-loop's residual per-frame overhead on the tunnel.

probe_kf_exec measures the per-call wall of back-to-back re-dispatches of
the real compiled frame programs (dispatch only, one block at the end).
The real loop additionally (a) submits one fetch_future (a blocking
device_get on an IO thread, ~28 ms RPC round trip) per frame and (b) runs
host bookkeeping between dispatches.  This probe re-dispatches the SAME
captured non-KF args in four modes to attribute the gap between the
probe's ideal per-call time and the bench's measured wall per frame:

  A dispatch only                          (= probe_kf_exec baseline)
  B dispatch + fetch_future of that call's (fvec, ivec) each call
  C dispatch + fetch_future every 2nd call (paired-frame readback)
  D mode B + ~2 ms of numpy host work per call (GIL interaction)

If B >> A the fetch RPCs serialize against execute RPCs on the tunnel and
batching readbacks (C) is the fix; if B ~= A but D >> B the host work is
not overlapping and the dispatch path needs a side thread.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sos_slam_tpu.models.full_system as fsm
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils.hostio import fetch_future
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings


def main():
    # EXACTLY the bench main scene (48 frames, prewarm at 26): every
    # program — incl. the selector-rung chain variants the density
    # adaptation may switch to mid-run — is already in the executable
    # cache after one bench run.  A different drive here risks a
    # multi-minute remote compile (and killing it wedges the tunnel).
    W, H = 640, 480
    n = 48
    calib = synthetic.default_calib(W, H)
    settings = default_settings()
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    frames = [jax.block_until_ready(imgs[i]) for i in range(n)]
    fs = FullSystem(calib, settings)

    nonkf_rec = None
    orig_complete = fs._complete_fused

    def capture(p):
        nonlocal nonkf_rec
        redo = orig_complete(p)
        if not fs._last_frame_was_kf and "dispatch_rec" in p:
            nonkf_rec = p["dispatch_rec"]
        return redo

    fs._complete_fused = capture
    for i in range(n):
        if i == 26:
            fs.prewarm()
        fs.add_active_frame(frames[i], timestamp=i * 0.05, frame_id=i)
        print(f"[probe] frame {i}", file=sys.stderr, flush=True)
    fs.finish_pending()
    assert nonkf_rec is not None
    kind, args, kw = nonkf_rec
    fn = fsm._fused_frame_vio_jit if kind == "vio" \
        else fsm._fused_frame_mono_jit

    # warm
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    spin = np.random.rand(256, 256).astype(np.float32)

    def run(mode, reps=24):
        futs = []
        r = fn(*args, **kw)          # not timed: settle queue
        jax.block_until_ready(r)
        t0 = time.time()
        for i in range(reps):
            out = fn(*args, **kw)
            fvec, ivec = out[-2], out[-1]
            if mode in ("B", "D") or (mode == "C" and i % 2 == 1):
                futs.append(fetch_future((fvec, ivec)))
            if mode == "D":
                t_spin = time.time()
                while time.time() - t_spin < 0.002:
                    spin @ spin
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1000.0
        for f in futs:
            f.result()
        return dt

    for mode in ("A", "B", "C", "D", "A"):
        vals = [run(mode) for _ in range(3)]
        print(f"mode {mode}: per-call ms = "
              f"{', '.join(f'{v:6.2f}' for v in vals)}  "
              f"(median {sorted(vals)[1]:6.2f})", flush=True)


if __name__ == "__main__":
    main()
