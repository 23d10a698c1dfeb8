"""Per-GN-iteration decomposition on the configured platform: how many
microseconds does the CURRENT-STATE part of make_precalc actually cost
inside a chained program, vs the tap gather and the fused kernel?

Times each candidate by chaining N_REP value-varied calls inside one
lax.scan (see docs/PERF_NOTES.md measurement rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_p as BP
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

N_REP = 30


def timed_scan(fn, x0, label):
    """fn: x (scalar f32) -> scalar f32 consuming the op under test."""
    @jax.jit
    def run(x0):
        def body(x, _):
            return fn(x), ()
        x, _ = jax.lax.scan(body, x0, None, length=N_REP)
        return x

    r = run(jnp.float32(x0))
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(jnp.float32(x0 + 1e-6))
    jax.block_until_ready(r)
    ms = (time.time() - t0) / N_REP * 1000.0
    print(f"{label:42s} {ms:8.3f} ms")
    return ms


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

    ba, dI = fs.ba, fs.dI
    s, w, h = fs.settings, fs.w, fs.h
    ev = B.make_precalc_eval(ba)
    ev = jax.block_until_ready(ev)

    def consume(t):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(t):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    # 1) full current-state precalc (the per-iteration rebuild)
    def f_pre(x):
        ba2 = ba._replace(state=ba.state + x * 1e-9)
        return consume(B.make_precalc(ba2, ev)) * 1e-12 + x

    # 2) eval part alone (loop-invariant; for reference)
    def f_ev(x):
        ba2 = ba._replace(state_zero=ba.state_zero + x * 1e-9)
        return consume(B.make_precalc_eval(ba2)) * 1e-12 + x

    # 3) pose/rel part only (exp + inv + pairwise rel)
    def f_rel(x):
        ba2 = ba._replace(state=ba.state + x * 1e-9)
        from sos_slam_tpu.utils import lie
        T_cw = B.state_to_pose(ba2.T_cw_eval, ba2.state)
        T_wc = lie.se3_inv(T_cw)
        rel = jnp.einsum("tij,hjk->htik", T_wc, T_cw,
                         precision=jax.lax.Precision.HIGHEST)
        return consume(rel) * 1e-12 + x

    # 4) adHTdelta part only
    def f_ad(x):
        delta = ba.state - ba.state_zero + x * 1e-9
        hi = jnp.einsum("htij,hj->hti", ev.adHost, delta,
                        precision=jax.lax.Precision.HIGHEST)
        ti = jnp.einsum("htij,tj->hti", ev.adTarget, delta,
                        precision=jax.lax.Precision.HIGHEST)
        return consume(hi + ti) * 1e-12 + x

    # 5) the fused BA iteration (for scale)
    pre0 = jax.block_until_ready(B.make_precalc(ba, ev))

    def f_fused(x):
        ba2 = ba._replace(idepth=ba.idepth + x * 1e-9)
        out = BP.fused_iteration(ba2, pre0, dI, s, w, h)
        return consume((out.H_top, out.b_top, out.H_sc, out.b_sc)) * 1e-12 + x

    # 6) precalc + fused together (what one GN iteration pays pre-solve)
    def f_iter(x):
        ba2 = ba._replace(state=ba.state + x * 1e-9)
        pre = B.make_precalc(ba2, ev)
        out = BP.fused_iteration(ba2, pre, dI, s, w, h)
        return consume((out.H_top, out.b_top, out.H_sc, out.b_sc)) * 1e-12 + x

    timed_scan(f_ev, 1.0, "make_precalc_eval (loop-invariant)")
    timed_scan(f_pre, 1.0, "make_precalc current-state part")
    timed_scan(f_rel, 1.0, "  pose exp+inv+pairwise rel only")
    timed_scan(f_ad, 1.0, "  adHTdelta einsums only")
    timed_scan(f_fused, 1.0, "fused_iteration (gather+kernel)")
    timed_scan(f_iter, 1.0, "precalc + fused_iteration")


if __name__ == "__main__":
    main()
