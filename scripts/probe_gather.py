"""Micro-benchmarks of bilinear-gather strategies for the epipolar sweep.

The trace sweep needs I(pos) at N x S x K scattered positions (N=2048 points,
S=40 steps, K=8 pattern taps) from a 640x480 intensity plane. Candidate
implementations:

  A. flat per-element gather (current interp_bilinear: 4 x jnp.take)
  B. per-point patch dynamic-slice (vmapped) + within-patch flat gather
  C. per-point patch + one-hot matmul sampling (MXU, bf16)
  D. row-slice gather: take whole rows (y-gather) then per-row x-gather

Run on the default (axon TPU) platform.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, S, K = 2048, 40, 8
H, W = 480, 640
P = 48  # patch size


def timed(label, fn, k=10):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    jax.block_until_ready(outs)
    print(f"{label:44s} {((time.time()-t0)/k)*1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    # synthetic sweep geometry: base points + unit directions
    base = rng.uniform([8, 8], [W - 48, H - 48], size=(N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    dirs = np.stack([np.cos(ang), np.sin(ang)], -1)
    offs = rng.uniform(-2, 2, size=(N, K, 2)).astype(np.float32)
    px = jnp.asarray(base[:, None, None, 0] + np.arange(S)[None, :, None]
                     * dirs[:, None, None, 0] + offs[:, None, :, 0])
    py = jnp.asarray(base[:, None, None, 1] + np.arange(S)[None, :, None]
                     * dirs[:, None, None, 1] + offs[:, None, :, 1])
    px = jax.block_until_ready(px)

    from sos_slam_tpu.ops.image import interp_bilinear

    @jax.jit
    def strat_a(img, px, py):
        return interp_bilinear(img, px, py)

    timed("A: flat per-element gather (current)",
          lambda: strat_a(img, px, py))

    ox = jnp.clip(jnp.floor(jnp.min(px, axis=(1, 2))) - 2, 0, W - P
                  ).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(jnp.min(py, axis=(1, 2))) - 2, 0, H - P
                  ).astype(jnp.int32)

    @jax.jit
    def strat_b(img, px, py, ox, oy):
        patches = jax.vmap(
            lambda y0, x0: jax.lax.dynamic_slice(img, (y0, x0), (P, P))
        )(oy, ox)                                   # (N,P,P)
        lx = jnp.clip(px - ox[:, None, None], 0.0, P - 2.0)
        ly = jnp.clip(py - oy[:, None, None], 0.0, P - 2.0)
        x0 = jnp.floor(lx).astype(jnp.int32)
        y0 = jnp.floor(ly).astype(jnp.int32)
        dx = lx - x0
        dy = ly - y0
        flat = patches.reshape(N, P * P)
        idx = (y0 * P + x0).reshape(N, S * K)
        tl = jnp.take_along_axis(flat, idx, 1).reshape(N, S, K)
        tr = jnp.take_along_axis(flat, idx + 1, 1).reshape(N, S, K)
        bl = jnp.take_along_axis(flat, idx + P, 1).reshape(N, S, K)
        br = jnp.take_along_axis(flat, idx + P + 1, 1).reshape(N, S, K)
        return (tl * (1 - dx) * (1 - dy) + tr * dx * (1 - dy)
                + bl * (1 - dx) * dy + br * dx * dy)

    rb = timed("B: patch slice + within-patch gather",
               lambda: strat_b(img, px, py, ox, oy))

    @jax.jit
    def strat_c(img, px, py, ox, oy):
        patches = jax.vmap(
            lambda y0, x0: jax.lax.dynamic_slice(img, (y0, x0), (P, P))
        )(oy, ox)                                   # (N,P,P)
        lx = jnp.clip(px - ox[:, None, None], 0.0, P - 2.0).reshape(N, S * K)
        ly = jnp.clip(py - oy[:, None, None], 0.0, P - 2.0).reshape(N, S * K)
        ii = jnp.arange(P, dtype=jnp.float32)
        # hat-function weights = linear interpolation one-hots
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx[..., None] - ii))  # (N,SK,P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly[..., None] - ii))
        t = jnp.einsum("nij,nsj->nsi", patches.astype(jnp.bfloat16),
                       wx.astype(jnp.bfloat16))      # (N,SK,P) rows
        return jnp.einsum("nsi,nsi->ns", t, wy.astype(jnp.bfloat16)
                          ).astype(jnp.float32)

    rc = timed("C: patch + hat-weight matmul (bf16 MXU)",
               lambda: strat_c(img, px, py, ox, oy))

    # verify B & C against A
    ra = np.asarray(strat_a(img, px, py))
    err_b = np.abs(np.asarray(rb) - ra).max()
    rc2 = np.asarray(rc).reshape(N, S, K)
    err_c = np.abs(rc2 - ra).max()
    print(f"max err  B={err_b:.2e}  C={err_c:.2e} (bf16 expected ~1e-2)")


if __name__ == "__main__":
    main()
