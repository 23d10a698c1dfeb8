"""Decompose fused_iteration's 4.6 ms: XLA prefix (pattern projection +
tap gather + packing) vs the Pallas kernel itself. Same scan-chained
measurement as probe_ba_p.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sos_slam_tpu.models import energy as E
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_p as BP
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import CPARS, PATTERN_OFFSETS, default_settings

N_REP = 20
HIGH = jax.lax.Precision.HIGHEST


def tree_sum(x):
    tot = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot


def prefix_only(ba, pre, dI, w, h):
    """The XLA part of fused_iteration up to (and incl.) input packing."""
    F, P = ba.F, ba.P
    fx, fy, cx, cy = jnp.asarray(B.calib_real(ba))
    pat = jnp.asarray(PATTERN_OFFSETS, jnp.float32)
    onehot = jax.nn.one_hot(ba.host, F, dtype=jnp.float32)
    Rc = jnp.einsum("ph,hx->px", onehot, pre.R.reshape(F, F * 9),
                    precision=HIGH).reshape(P, F, 3, 3)
    tc = jnp.einsum("ph,hx->px", onehot, pre.t.reshape(F, F * 3),
                    precision=HIGH).reshape(P, F, 3)
    up = ba.u[:, None] + pat[None, :, 0]
    vp = ba.v[:, None] + pat[None, :, 1]
    KliPp = jnp.stack(
        [(up - cx) / fx, (vp - cy) / fy, jnp.ones_like(up)], -1)
    ptp_c = (jnp.einsum("pfij,pkj->pfki", Rc, KliPp, precision=HIGH)
             + tc[:, :, None, :] * ba.idepth[:, None, None, None])
    z = ptp_c[..., 2]
    pat_ok = z > 1e-6
    Kup = ptp_c[..., 0] / z * fx + cx
    Kvp = ptp_c[..., 1] / z * fy + cy
    pat_ok &= (Kup > 1.1) & (Kvp > 1.1) & (Kup < w - 3) & (Kvp < h - 3)
    hit = BP._take_taps(dI, Kup, Kvp)
    okf = (pat_ok & jnp.isfinite(hit[..., 0])).astype(jnp.float32)
    big0 = jnp.concatenate(
        [jnp.transpose(hit, (1, 2, 3, 0)).reshape(F * 24, P),
         jnp.transpose(okf, (1, 2, 0)).reshape(F * 8, P)], 0)
    return big0


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
    pre0 = B.make_precalc(ba)

    def bench(name, stage_fn):
        @jax.jit
        def run(ba0, c0):
            def body(c, _):
                b = ba0._replace(state=ba0.state + c * 1e-12,
                                 idepth=ba0.idepth + c)
                return tree_sum(stage_fn(b)) * 1e-30 + c, None
            c, _ = jax.lax.scan(body, c0, None, length=N_REP)
            return c

        t0 = time.time()
        jax.block_until_ready(run(ba, jnp.float32(0.0)))
        t_compile = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(ba, jnp.float32(1e-7)))
        dt = (time.time() - t0) * 1000.0 / N_REP
        print(f"{name:>36}: {dt:7.3f} ms/call   (compile {t_compile:.0f} s)",
              flush=True)
        return dt

    bench("make_precalc", lambda b: B.make_precalc(b))
    bench("xla prefix (proj+gather+pack)",
          lambda b: prefix_only(b, B.make_precalc(b), dI, w, h))
    bench("fused_iteration (prefix+kernel)",
          lambda b: BP.fused_iteration(b, B.make_precalc(b), dI, s, w, h))
    bench("solve_system only",
          lambda b: B.solve_system(
              b, b.HM + jnp.eye(CPARS + 8 * b.F),
              b.bM, jnp.zeros_like(b.HM), jnp.zeros_like(b.bM)))


if __name__ == "__main__":
    main()
