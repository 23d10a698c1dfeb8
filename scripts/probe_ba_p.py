"""Head-to-head on the configured platform: einsum BA forms (ops/ba.py)
vs the Pallas fused iteration (ops/ba_p.py), on a realistic steady-state
window (P=2048, F=8, VGA dI).

Same measurement discipline as probe_ba_forms.py: value-varied calls
chained inside ONE outer jit via lax.scan (a bare per-call loop pays the
~25 ms tunnel RPC floor per call and is useless for stage timing).
"""
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
        print(f"{name:>36}: {dt:7.3f} ms/call   (compile {t_compile:.0f} s)",
              flush=True)
        return dt

    def set_form(on: bool):
        os.environ["SOS_SLAM_BA_P"] = "1" if on else "0"
        E.optimize.clear_cache()
        E.marginalize_points.clear_cache()

    marg = (jnp.arange(ba.P) % 7 == 0) & ba.pt_valid

    set_form(False)
    bench("gn_step (einsum)", lambda b: E.gn_step(b, dI, s, w, h))
    bench("optimize <=6 its (einsum)",
          lambda b: E.optimize(b, dI, s, w, h, max_its=s.max_opt_iterations,
                               min_its=s.min_opt_iterations))
    bench("marginalize_points (einsum)",
          lambda b: E.marginalize_points(b, dI, marg, s, w, h))

    set_form(True)
    bench("fused_iteration (pallas)",
          lambda b: BP.fused_iteration(b, B.make_precalc(b), dI, s, w, h))
    bench("gn_step (pallas)", lambda b: E.gn_step(b, dI, s, w, h))
    bench("optimize <=6 its (pallas)",
          lambda b: E.optimize(b, dI, s, w, h, max_its=s.max_opt_iterations,
                               min_its=s.min_opt_iterations))
    bench("marginalize_points (pallas)",
          lambda b: E.marginalize_points(b, dI, marg, s, w, h))

    # numeric cross-check at the full-optimize level
    set_form(False)
    r0, st0 = E.optimize(ba, dI, s, w, h, max_its=6)
    set_form(True)
    r1, st1 = E.optimize(ba, dI, s, w, h, max_its=6)
    import numpy as np
    print("optimize rmse einsum/pallas:",
          float(st0["rmse"]), float(st1["rmse"]),
          " n_active:", int(st0["n_active"]), int(st1["n_active"]),
          " max|state diff|:",
          float(np.max(np.abs(np.asarray(r0.state) - np.asarray(r1.state)))),
          flush=True)


if __name__ == "__main__":
    main()
