"""TPU A/B: XLA build_pyramid vs the fused Pallas pyramid kernel.

Chained value-varying inputs inside one outer jit per variant (the runtime
memoizes identical executions; see docs/PERF_NOTES.md measurement rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sos_slam_tpu.ops.image import build_pyramid
from sos_slam_tpu.ops.pallas_kernels import build_pyramid_pallas

W, H, L, N = 640, 480, 6, 20


def chain(fn):
    @jax.jit
    def run(img0):
        def body(img, _):
            pyr, asg = fn(img, L)
            # consume every level so nothing is dead-code-eliminated;
            # feed a value-dependent image back in
            s = sum(jnp.sum(p) for p in pyr) + sum(jnp.sum(a) for a in asg)
            return img + s * 1e-12, s

        img, ss = jax.lax.scan(body, img0, None, length=N)
        return ss

    return run


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    for name, fn in [("xla", build_pyramid),
                     ("pallas", build_pyramid_pallas)]:
        try:
            run = chain(fn)
            out = jax.block_until_ready(run(img))  # compile
            t0 = time.time()
            out = jax.block_until_ready(run(img + 1.0))
            dt = (time.time() - t0) * 1000.0
            print(f"{name}: {dt / N:.2f} ms/pyramid  (sum={float(out[0]):.1f})")
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
