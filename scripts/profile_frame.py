"""Per-component device-time breakdown of the steady-state frame/KF path.

Boots the full system on the synthetic sequence until initialized, then
times each fused program as pure device execution: dispatch K repeats
back-to-back, block once, divide. This separates XLA execution cost from
the tunnel RPC floor so optimization effort lands on the right component.

Usage: python scripts/profile_frame.py [n_repeat]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_log_compiles", True)


def timed(label, fn, k=8):
    """Dispatch fn() k times back-to-back, block once. Report per-call ms."""
    out = fn()
    jax.block_until_ready(out)          # warm (compile) outside the timing
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / k * 1000.0
    print(f"{label:36s}  exec={dt:8.2f} ms", flush=True)
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from sos_slam_tpu.models import full_system as FS
    from sos_slam_tpu.models import energy as E
    from sos_slam_tpu.models.full_system import FullSystem
    from sos_slam_tpu.ops import tracker as TK
    from sos_slam_tpu.ops import ba as B
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
    print(f"booted: n_kf={fs.stats['n_kf']} n_frames={fs.stats['n_frames']}",
          flush=True)
    jax.block_until_ready(fs.ba.state)

    intr = tuple(calib.intrinsics(l) for l in range(fs.n_levels))
    img = imgs[N - 1]
    ref_shell = fs.shells[fs.frame_shell_idx[fs.ref_slot]]
    T_cw_ref = jnp.asarray(ref_shell.cam_to_world, jnp.float32)
    aff0 = jnp.zeros(2, jnp.float32)
    exposures = jnp.ones(2, jnp.float32)
    hyp = jnp.eye(4, dtype=jnp.float32)
    ref_aff = jnp.asarray(fs.ref_aff)

    pyr, _ = build_pyramid(img, fs.n_levels)
    pyr = jax.block_until_ready(pyr)

    timed("pyramid build (6 lvls)",
          lambda: build_pyramid(img, fs.n_levels)[0], k)

    timed("track 1-hyp full cascade",
          lambda: TK.track_hypotheses(
              pyr, fs.templates, hyp[None], aff0, ref_aff, exposures, intr,
              fs.n_levels, coarse_cutoff_th=settings.coarse_cutoff_th,
              huber=settings.huber_th), k)

    timed("trace (epipolar sweep)",
          lambda: FS._trace_jit(
              fs.ba, fs.imm, pyr[0], T_cw_ref, aff0, exposures[1],
              fs.w, fs.h, settings), k)

    timed("frame stats",
          lambda: FS._frame_stats_jit(fs.ba, fs.imm), k)

    timed("FULL frame step (fused)",
          lambda: FS._frame_step_jit(
              img, fs.ba, fs.imm, fs.templates, hyp, T_cw_ref, aff0,
              ref_aff, exposures, jnp.float32(1e9), T_cw_ref,
              jnp.float32(100.0),
              settings, fs.w, fs.h, fs.n_levels, intr), k)

    # KF-path programs (re-run on the current state; results discarded)
    timed("BA optimize (6 its cap)",
          lambda: E.optimize(fs.ba, fs.dI, settings, fs.w, fs.h,
                             max_its=settings.max_opt_iterations,
                             min_its=settings.min_opt_iterations)[0].state, k)

    timed("BA optimize (1 it)",
          lambda: E.optimize(fs.ba, fs.dI, settings, fs.w, fs.h,
                             max_its=1, min_its=1)[0].state, k)

    timed("BA optimize (2 its)",
          lambda: E.optimize(fs.ba, fs.dI, settings, fs.w, fs.h,
                             max_its=2, min_its=2)[0].state, k)

    timed("HdiF",
          lambda: FS._hdif_jit(fs.ba, fs.dI, settings, fs.w, fs.h), k)

    timed("KF core (BA+HdiF+template)",
          lambda: FS._kf_core_jit(
              fs.ba, fs.dI, pyr, settings, fs.w, fs.h, fs.tmpl_sizes,
              settings.max_opt_iterations,
              settings.min_opt_iterations)[0].state, k)

    timed("activation (gate+GN+scatter)",
          lambda: FS._activate_jit(
              fs.ba, fs.imm, fs.dI,
              jnp.float32(fs.current_min_act_dist), fs.w, fs.h,
              settings)[0].state, k)

    timed("KF mega (insert+act+BA core)",
          lambda: FS._kf_mega_jit(
              fs.ba, fs.imm, fs.dI, pyr, T_cw_ref, aff0,
              jnp.float32(1.0), jnp.zeros(8), jnp.int32(5),
              jnp.float32(fs.current_min_act_dist), fs.tmpl_sizes,
              settings.max_opt_iterations, settings.min_opt_iterations,
              settings, fs.w, fs.h)[0].state, k)

    no_flags = jnp.zeros(fs.F, bool)
    n_slots = min(settings.max_immature, fs.imm.u.shape[0])
    timed("marg+select",
          lambda: FS._marg_select_jit(
              fs.ba, fs.imm, fs.dI, fs.HdiF, no_flags, pyr[0],
              jnp.int32(5), fs.key, jnp.float32(
                  settings.desired_immature_density),
              settings, fs.w, fs.h, getattr(fs, "_sel_pot", 3),
              n_slots)[0].state, k)

    timed("frame marg",
          lambda: FS._marg_frame_jit(
              fs.ba, fs.imm, fs.dI, jnp.int32(1), settings, fs.w,
              fs.h)[0].state, k)


if __name__ == "__main__":
    main()
