"""Intra-keyframe-chain stage timing on the configured platform.

Runs the fused pipeline for ~20 frames to get a REAL mid-run window state,
then times each keyframe-chain sub-program by chaining N value-varied calls
inside ONE outer jit (lax.scan with a serializing carry) — the only honest
way to measure exec time on the tunneled backend (a bare per-call loop pays
a ~25 ms RPC floor per call; see docs/PERF_NOTES.md measurement rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sos_slam_tpu.models.full_system as fsm
from sos_slam_tpu.models import energy as E
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

N_REP = 10


def tree_sum(x):
    tot = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot


def main():
    W, H = 640, 480
    n = 22
    calib = synthetic.default_calib(W, H)
    settings = default_settings()
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    imgs = jax.block_until_ready(imgs)
    fs = FullSystem(calib, settings)
    for i in range(n):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    fs.finish_pending()
    print(f"state ready: n_kf={fs.stats['n_kf']}", flush=True)

    ba, imm, dI = fs.ba, fs.imm, fs.dI
    pyr = fs.frame_pyramids[fs.ref_slot]
    s, w, h = fs.settings, fs.w, fs.h
    slot = jnp.int32(len(fs.frame_shell_idx) - 1)
    HdiF = fs.HdiF
    key = jax.random.PRNGKey(7)
    prior_row = fs._prior_row(first=False)
    T_cw = jnp.asarray(fs.shells[fs.frame_shell_idx[-1]].cam_to_world,
                       jnp.float32)
    aff = jnp.asarray(fs.shells[fs.frame_shell_idx[-1]].aff, jnp.float32)

    def bench(name, stage_fn):
        """stage_fn(ba_perturbed) -> any pytree; all float leaves consumed."""
        @jax.jit
        def run(ba0, c0):
            def body(c, _):
                b = ba0._replace(state=ba0.state + c * 1e-12)
                return tree_sum(stage_fn(b)) * 1e-30 + c, None
            c, _ = jax.lax.scan(body, c0, None, length=N_REP)
            return c

        t0 = time.time()
        jax.block_until_ready(run(ba, jnp.float32(0.0)))
        t_compile = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(ba, jnp.float32(1e-7)))
        dt = (time.time() - t0) * 1000.0 / N_REP
        print(f"{name:>28}: {dt:7.2f} ms/call   (compile {t_compile:.0f} s)",
              flush=True)

    from sos_slam_tpu.models import window as WIN

    bench("E.optimize (BA, <=6 its)",
          lambda b: E.optimize(b, dI, s, w, h, max_its=s.max_opt_iterations,
                               min_its=s.min_opt_iterations))
    bench("E.gn_step (one iteration)",
          lambda b: E.gn_step(b, dI, s, w, h))
    bench("_hdif_jit (1 linearize+schur)",
          lambda b: fsm._hdif_jit(b, dI, s, w, h))
    bench("build_track_template",
          lambda b: WIN.build_track_template(b, HdiF, pyr, fs.n_levels,
                                             fs.tmpl_sizes, w, h))
    bench("_activate_jit",
          lambda b: fsm._activate_jit(
              b, imm, dI, jnp.float32(fs.current_min_act_dist), w, h, s))
    bench("_marg_select_jit",
          lambda b: fsm._marg_select_jit(
              b, imm, dI, HdiF, jnp.zeros(fs.F, bool), pyr[0], slot, key,
              jnp.float32(s.desired_immature_density), s, w, h,
              getattr(fs, "_sel_pot", 3),
              min(s.max_immature, fs.imm.u.shape[0])))
    bench("_maybe_marg_frame (taken)",
          lambda b: fsm._maybe_marg_frame_jit(
              b, imm, dI, jnp.array([1, -1, -1, -1], jnp.int32), 0, s, w, h))
    bench("_maybe_marg_frame (skip)",
          lambda b: fsm._maybe_marg_frame_jit(
              b, imm, dI, jnp.array([1, -1, -1, -1], jnp.int32), 1, s, w, h))
    bench("_select_insert_jit",
          lambda b: fsm._select_insert_jit(
              imm, dI[0] + b.state[0, 0] * 1e-9, slot, key,
              jnp.float32(s.desired_immature_density), s,
              getattr(fs, "_sel_pot", 3),
              min(s.max_immature, fs.imm.u.shape[0])))
    bench("_kf_mega_jit (whole)",
          lambda b: fsm._kf_mega_jit(
              b, imm, dI, pyr, T_cw, aff, jnp.float32(1.0), prior_row,
              slot, jnp.float32(fs.current_min_act_dist), fs.tmpl_sizes,
              s.max_opt_iterations, s.min_opt_iterations, s, w, h))


if __name__ == "__main__" and os.environ.get("SOS_PROFILE_STEP") != "1":
    main()


def profile_step():
    """Scan-chained decomposition of the per-frame step at 640x480."""
    import time
    W, H = 640, 480
    n = 22
    calib = synthetic.default_calib(W, H)
    settings = default_settings()
    twist = jnp.array([0.03, 0.012, 0.02, 0.002, 0.004, 0.001])
    imgs, _, _ = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    imgs = jax.block_until_ready(imgs)
    fs = FullSystem(calib, settings)
    for i in range(n):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    fs.finish_pending()
    print(f"state ready: n_kf={fs.stats['n_kf']}", flush=True)

    from sos_slam_tpu.ops import image as imops
    from sos_slam_tpu.ops import tracker as TK
    intr = tuple(calib.intrinsics(l) for l in range(fs.n_levels))
    img0 = imgs[-1]
    tmpl = fs.templates
    N_REP = 10

    def bench(name, fn):
        @jax.jit
        def run(x0, c0):
            def body(c, _):
                out = fn(x0 + c * 1e-9)
                s = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(out):
                    if jnp.issubdtype(leaf.dtype, jnp.floating):
                        s = s + jnp.sum(leaf).astype(jnp.float32)
                return s * 1e-30 + c, None
            c, _ = jax.lax.scan(body, c0, None, length=N_REP)
            return c
        jax.block_until_ready(run(img0, jnp.float32(0.0)))
        t0 = time.time()
        jax.block_until_ready(run(img0, jnp.float32(1e-6)))
        print(f"{name:>28}: {(time.time()-t0)*1000/N_REP:7.2f} ms",
              flush=True)

    bench("build_pyramid (6 lvl)",
          lambda im: imops.build_pyramid(im, fs.n_levels))

    def track_only(im):
        pyr, _ = imops.build_pyramid(im, fs.n_levels)
        return TK.track_newest_coarse(
            pyr, tmpl, jnp.eye(4), jnp.zeros(2),
            jnp.asarray(fs.ref_aff, jnp.float32),
            jnp.array([1.0, 1.0], jnp.float32),
            jnp.full((6,), jnp.nan), intr, fs.n_levels)

    bench("pyramid + 1-hyp track", track_only)

    def track5(im):
        pyr, _ = imops.build_pyramid(im, fs.n_levels)
        Ts = jnp.stack([jnp.eye(4)] * 5)
        return TK.track_hypotheses(pyr, tmpl, Ts, jnp.zeros(2),
                                   jnp.asarray(fs.ref_aff, jnp.float32),
                                   jnp.array([1.0, 1.0], jnp.float32),
                                   intr, fs.n_levels)

    bench("pyramid + 5-hyp track", track5)

    def trace_only(im):
        pyr, _ = imops.build_pyramid(im, fs.n_levels)
        return fsm._trace_stats_jit(
            fs.ba, fs.imm, pyr[0],
            jnp.asarray(fs.shells[-1].cam_to_world, jnp.float32),
            jnp.zeros(2), jnp.float32(1.0), fs.w, fs.h, settings)

    bench("pyramid + trace + stats", trace_only)


if __name__ == "__main__" and os.environ.get("SOS_PROFILE_STEP") == "1":
    profile_step()
