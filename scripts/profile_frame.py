"""Per-component device-time breakdown of the steady-state frame step.

Boots the full system on the synthetic sequence until initialized, then
times each fused program (pyramid, track, trace, stats, full frame step,
KF mega, marg+select, frame-marg) as pure device execution: dispatch K
repeats back-to-back, block once, divide. This separates XLA execution
cost from the tunnel RPC floor so optimization effort lands on the right
component.

Usage: python scripts/profile_frame.py [n_repeat]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, k=8):
    """Dispatch fn() k times back-to-back, block once. Report per-call ms."""
    out = fn()
    jax.block_until_ready(out)          # warm (compile) outside the timing
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / k * 1000.0
    # single-dispatch wall time (incl. one RPC round trip)
    t0 = time.time()
    jax.block_until_ready(fn())
    one = (time.time() - t0) * 1000.0
    print(f"{label:34s}  exec={dt:8.2f} ms   single={one:8.2f} ms")
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from sos_slam_tpu.models import full_system as FS
    from sos_slam_tpu.models.full_system import FullSystem
    from sos_slam_tpu.ops import tracker as TK
    from sos_slam_tpu.ops.image import build_pyramid
    from sos_slam_tpu.utils import synthetic
    from sos_slam_tpu.utils.config import default_settings

    W, H = 640, 480
    N = 30
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, poses = synthetic.make_sequence(calib, N, twist, plane_z=2.0)
    imgs = jax.block_until_ready(imgs)

    settings = default_settings()
    fs = FullSystem(calib, settings)
    for i in range(N):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        if fs.initialized and fs.stats["n_kf"] >= 6 and i >= 20:
            break
    print(f"booted: {fs.stats}")
    jax.block_until_ready(fs.ba.state)

    intr = tuple(calib.intrinsics(l) for l in range(fs.n_levels))
    img = imgs[N - 1]
    ref_shell = fs.shells[fs.frame_shell_idx[fs.ref_slot]]
    T_cw_ref = jnp.asarray(ref_shell.cam_to_world, jnp.float32)
    aff0 = jnp.zeros(2, jnp.float32)
    exposures = jnp.ones(2, jnp.float32)
    hyp = jnp.eye(4, dtype=jnp.float32)

    pyr, _ = build_pyramid(img, fs.n_levels)
    pyr = jax.block_until_ready(pyr)

    timed("pyramid build (6 lvls)",
          lambda: build_pyramid(img, fs.n_levels)[0], k)

    timed("track primary (full cascade)",
          lambda: TK.track_hypotheses(
              pyr, fs.templates, hyp[None], aff0, jnp.asarray(fs.ref_aff),
              exposures, intr, fs.n_levels,
              coarse_cutoff_th=settings.coarse_cutoff_th,
              huber=settings.huber_th), k)

    timed("track lvl0 only",
          lambda: TK.track_hypotheses(
              pyr, fs.templates, hyp[None], aff0, jnp.asarray(fs.ref_aff),
              exposures, intr, fs.n_levels, min_level=0,
              coarse_cutoff_th=settings.coarse_cutoff_th,
              huber=settings.huber_th) if False else
          TK.track_newest_coarse(
              pyr, fs.templates, hyp, aff0, jnp.asarray(fs.ref_aff),
              exposures, jnp.full((6,), jnp.nan), intr, fs.n_levels,
              coarse_cutoff_th=settings.coarse_cutoff_th,
              huber=settings.huber_th, min_level=0), k)

    timed("trace (epipolar sweep)",
          lambda: FS._trace_jit(
              fs.ba, fs.imm, pyr[0], T_cw_ref, aff0, exposures[1],
              fs.w, fs.h, settings), k)

    timed("frame stats",
          lambda: FS._frame_stats_jit(fs.ba, fs.imm), k)

    timed("FULL frame step (fused)",
          lambda: FS._frame_step_jit(
              img, fs.ba, fs.imm, fs.templates, hyp, T_cw_ref, aff0,
              jnp.asarray(fs.ref_aff), exposures, jnp.float32(1e9),
              settings, fs.w, fs.h, fs.n_levels, intr), k)

    # KF-path programs (state-shaped; re-run on the current state)
    sizes = fs.template_sizes if hasattr(fs, "template_sizes") else None
    timed("KF core (BA+HdiF+template)",
          lambda: FS._kf_core_jit(
              fs.ba, fs.dI, pyr, settings, fs.w, fs.h,
              fs.tmpl_sizes if hasattr(fs, "tmpl_sizes") else
              tuple(t.u.shape[0] for t in fs.templates),
              settings.max_opt_iterations, settings.min_opt_iterations), k)


if __name__ == "__main__":
    main()
