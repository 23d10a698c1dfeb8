"""Stage-level timing of gn_step's internals on the configured platform,
comparing the factored-einsum accumulate_top vs the khatri-rao/matmul
accumulate_top_kr form (ops/ba.py), plus every other gn_step stage.

Same measurement discipline as profile_chain.py: value-varied calls chained
inside ONE outer jit via lax.scan (a bare per-call loop pays the ~25 ms
tunnel RPC floor per call).
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
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.ops import ba_t as BT
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

N_REP = 20


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

    ba, dI = fs.ba, fs.dI
    s, w, h = fs.settings, fs.w, fs.h

    def bench(name, stage_fn):
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
        print(f"{name:>34}: {dt:7.3f} ms/call   (compile {t_compile:.0f} s)",
              flush=True)
        return dt

    # precompute a fixed lin for the accumulate-only stages (so their bench
    # isolates the accumulation, with the value variation threaded through ba)
    pre0 = B.make_precalc(ba)
    lin0 = jax.block_until_ready(B.linearize(ba, pre0, dI, s, w, h))

    bench("make_precalc", lambda b: B.make_precalc(b))
    bench("linearize (P,F,8)",
          lambda b: B.linearize(b, B.make_precalc(b), dI, s, w, h))
    bench("linearize_t (lanes-last)",
          lambda b: BT.linearize_t(b, B.make_precalc(b), dI, s, w, h))

    def lin_of(b):
        return B.linearize(b, pre0, dI, s, w, h)

    def lin_t_of(b):
        return BT.linearize_t(b, pre0, dI, s, w, h)

    bench("update_energy_th (sort)",
          lambda b: E.update_energy_th(b, lin_of(b), s))
    bench("accumulate_top (einsum)",
          lambda b: B.accumulate_top(b, pre0, lin_of(b)))
    bench("accumulate_top_kr (matmul)",
          lambda b: B.accumulate_top_kr(b, pre0, lin_of(b)))
    bench("lin_t+accumulate_top_t",
          lambda b: BT.accumulate_top_t(b, pre0, lin_t_of(b)))
    bench("accumulate_schur",
          lambda b: B.accumulate_schur(b, pre0, lin_of(b)))
    bench("lin_t+accumulate_schur_t",
          lambda b: BT.accumulate_schur_t(b, pre0, lin_t_of(b)))
    bench("schur_Hb",
          lambda b: B.schur_Hb(B.accumulate_schur(b, pre0, lin_of(b))))

    def full_solve(b, top_fn):
        pre = B.make_precalc(b)
        lin = B.linearize(b, pre, dI, s, w, h)
        b2 = b._replace(energy_th=E.update_energy_th(b, lin, s))
        H_top, b_top = top_fn(b2, pre, lin)
        H_top, b_top = B.add_priors(b2, H_top, b_top, s)
        sc = B.accumulate_schur(b2, pre, lin)
        H_sc, b_sc = B.schur_Hb(sc)
        x = B.solve_system(b2, H_top, b_top, H_sc, b_sc)
        return x

    def full_solve_t(b):
        pre = B.make_precalc(b)
        lin = BT.linearize_t(b, pre, dI, s, w, h)
        b2 = b._replace(energy_th=BT.update_energy_th_t(b, lin, s))
        H_top, b_top = BT.accumulate_top_t(b2, pre, lin)
        H_top, b_top = B.add_priors(b2, H_top, b_top, s)
        sc = BT.accumulate_schur_t(b2, pre, lin)
        H_sc, b_sc = BT.schur_Hb_t(sc)
        x = B.solve_system(b2, H_top, b_top, H_sc, b_sc)
        return x

    bench("lin+top+schur+solve (einsum)",
          lambda b: full_solve(b, B.accumulate_top))
    bench("lin+top+schur+solve (kr)",
          lambda b: full_solve(b, B.accumulate_top_kr))
    bench("lin+top+schur+solve (lanes-t)", full_solve_t)
    bench("gn_step (current wiring)",
          lambda b: E.gn_step(b, dI, s, w, h))
    bench("optimize (<=6 its)",
          lambda b: E.optimize(b, dI, s, w, h, max_its=s.max_opt_iterations,
                               min_its=s.min_opt_iterations))


if __name__ == "__main__":
    main()
