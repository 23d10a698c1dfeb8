"""Micro-benchmark: bilinear gather strategies at the BA-linearize shape.

Shape: (P=2048 points, F=8 frames, K=8 pattern taps), 4 bilinear corners,
3 channels [I, dx, dy], source dI (F, 480, 640, 3) f32. This gather runs
once per GN iteration (+ final pass) and dominates the keyframe chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P, F, K = 2048, 8, 8
H, W = 480, 640
REP = 10


def timed(label, fn, *args):
    out = jax.block_until_ready(fn(*args))   # compile
    # vary the coordinates per rep to defeat the execution memoizer
    t0 = time.time()
    prev = None
    for i in range(REP):
        prev = fn(args[0], args[1] + i * 1e-4, args[2] + i * 1e-4)
    jax.block_until_ready(prev)
    print(f"{label:50s} {((time.time()-t0)/REP)*1e3:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    dI = jnp.asarray(rng.normal(size=(F, H, W, 3)).astype(np.float32))
    Ku = jnp.asarray(rng.uniform(4, W - 5, size=(P, F, K)).astype(np.float32))
    Kv = jnp.asarray(rng.uniform(4, H - 5, size=(P, F, K)).astype(np.float32))
    jax.block_until_ready((dI, Ku, Kv))

    from sos_slam_tpu.ops.image import interp_bilinear

    @jax.jit
    def strat_a(dI, Ku, Kv):
        def hit_one(dI_f, Ku_f, Kv_f):
            return interp_bilinear(dI_f, Ku_f, Kv_f)
        return jax.vmap(hit_one, in_axes=(0, 1, 1), out_axes=1)(dI, Ku, Kv)

    ra = timed("A: per-frame vmap of 4x take rows of (HW,3)", strat_a,
               dI, Ku, Kv)

    @jax.jit
    def strat_b(dI, Ku, Kv):
        flat = dI.reshape(F * H * W, 3)
        x0 = jnp.clip(jnp.floor(Ku), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv), 0, H - 2).astype(jnp.int32)
        dx = jnp.clip(Ku - x0, 0, 1)[..., None]
        dy = jnp.clip(Kv - y0, 0, 1)[..., None]
        fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]
        idx = fofs + y0 * W + x0
        tl = jnp.take(flat, idx, axis=0)
        tr = jnp.take(flat, idx + 1, axis=0)
        bl = jnp.take(flat, idx + W, axis=0)
        br = jnp.take(flat, idx + W + 1, axis=0)
        return (tl * (1 - dx) * (1 - dy) + tr * dx * (1 - dy)
                + bl * (1 - dx) * dy + br * dx * dy)

    rb = timed("B: ONE fused 4x take over (F*H*W,3)", strat_b, dI, Ku, Kv)

    @jax.jit
    def strat_c(dI, Ku, Kv):
        flat = dI.reshape(F * H * W * 3)
        x0 = jnp.clip(jnp.floor(Ku), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv), 0, H - 2).astype(jnp.int32)
        dx = jnp.clip(Ku - x0, 0, 1)[..., None]
        dy = jnp.clip(Kv - y0, 0, 1)[..., None]
        fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]
        base = (fofs + y0 * W + x0) * 3
        cofs = jnp.arange(3, dtype=jnp.int32)
        idx = base[..., None] + cofs          # (P,F,K,3)
        tl = flat[idx]
        tr = flat[idx + 3]
        bl = flat[idx + 3 * W]
        br = flat[idx + 3 * W + 3]
        return (tl * (1 - dx) * (1 - dy) + tr * dx * (1 - dy)
                + bl * (1 - dx) * dy + br * dx * dy)

    rc = timed("C: scalar 1-D takes (channels in index)", strat_c, dI, Ku, Kv)

    # D: 2-row slice gather via lax.gather with slice_sizes (1,2,2,3):
    # one gathered (2,2) window per tap = 1 index set instead of 4
    @jax.jit
    def strat_d(dI, Ku, Kv):
        x0 = jnp.clip(jnp.floor(Ku), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv), 0, H - 2).astype(jnp.int32)
        dx = jnp.clip(Ku - x0, 0, 1)[..., None]
        dy = jnp.clip(Kv - y0, 0, 1)[..., None]
        fidx = jnp.broadcast_to(
            jnp.arange(F, dtype=jnp.int32)[None, :, None], (P, F, K))
        starts = jnp.stack([fidx, y0, x0], -1).reshape(-1, 3)  # (PFK, 3)
        out = jax.lax.gather(
            dI, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2)),
            slice_sizes=(1, 2, 2, 3),
        )  # (PFK, 2, 2, 3)
        win = out.reshape(P, F, K, 2, 2, 3)
        wx = jnp.concatenate([1 - dx[..., None, :], dx[..., None, :]], -2)
        wy = jnp.concatenate([1 - dy[..., None, :], dy[..., None, :]], -2)
        return jnp.einsum("pfkyxc,pfky,pfkx->pfkc", win,
                          wy[..., 0], wx[..., 0])

    rd = timed("D: lax.gather (2,2,3) windows", strat_d, dI, Ku, Kv)

    # E: strategy B on a bf16 source (gather bf16, cast taps to f32)
    dI16 = dI.astype(jnp.bfloat16)

    @jax.jit
    def strat_e2(dI16, Ku, Kv):
        flat = dI16.reshape(F * H * W, 3)
        x0 = jnp.clip(jnp.floor(Ku), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv), 0, H - 2).astype(jnp.int32)
        dx = jnp.clip(Ku - x0, 0, 1)[..., None]
        dy = jnp.clip(Kv - y0, 0, 1)[..., None]
        fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]
        idx = fofs + y0 * W + x0
        tl = jnp.take(flat, idx, axis=0).astype(jnp.float32)
        tr = jnp.take(flat, idx + 1, axis=0).astype(jnp.float32)
        bl = jnp.take(flat, idx + W, axis=0).astype(jnp.float32)
        br = jnp.take(flat, idx + W + 1, axis=0).astype(jnp.float32)
        return (tl * (1 - dx) * (1 - dy) + tr * dx * (1 - dy)
                + bl * (1 - dx) * dy + br * dx * dy)

    re2 = timed("E: B with bf16 source (taps cast to f32)", strat_e2,
                dI16, Ku, Kv)

    # F: (HW, 4)-padded channels — lane-friendlier rows
    dI4 = jnp.pad(dI, ((0, 0), (0, 0), (0, 0), (0, 1)))

    @jax.jit
    def strat_f(dI4, Ku, Kv):
        flat = dI4.reshape(F * H * W, 4)
        x0 = jnp.clip(jnp.floor(Ku), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv), 0, H - 2).astype(jnp.int32)
        dx = jnp.clip(Ku - x0, 0, 1)[..., None]
        dy = jnp.clip(Kv - y0, 0, 1)[..., None]
        fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]
        idx = fofs + y0 * W + x0
        tl = jnp.take(flat, idx, axis=0)
        tr = jnp.take(flat, idx + 1, axis=0)
        bl = jnp.take(flat, idx + W, axis=0)
        br = jnp.take(flat, idx + W + 1, axis=0)
        return ((tl * (1 - dx) * (1 - dy) + tr * dx * (1 - dy)
                 + bl * (1 - dx) * dy + br * dx * dy))[..., :3]

    rf = timed("F: (HW,4)-padded rows", strat_f, dI4, Ku, Kv)

    for nm, r in [("B", rb), ("C", rc), ("D", rd), ("F", rf)]:
        err = float(jnp.max(jnp.abs(r - ra)))
        print(f"  max err {nm} vs A: {err:.2e}")
    err = float(jnp.max(jnp.abs(re2 - ra)))
    print(f"  max err E vs A: {err:.2e} (bf16 ~1e-2 expected)")


if __name__ == "__main__":
    main()
