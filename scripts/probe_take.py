"""Gather-form shootout at the BA-linearize shape (P=2048, F=8, VGA, C=3):
the per-iteration tap gather is the dominant op of the keyframe chain.
Times scan-chained variants with value-varying indices.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P, F, H, W = 2048, 8, 480, 640
N_REP = 30


def timed(fn, label, *args):
    @jax.jit
    def run(t, args):
        def body(c, _):
            out = fn(c, *args)
            return c + jnp.float32(1.0) + out * 1e-20, ()
        c, _ = jax.lax.scan(body, t, None, length=N_REP)
        return c

    r = run(jnp.float32(0.0), args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(jnp.float32(0.5), args)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / N_REP * 1000.0
    print(f"{label:44s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    dI = jax.random.uniform(key, (F, H, W, 3), jnp.float32)
    dI4 = jnp.concatenate([dI, jnp.zeros((F, H, W, 1))], -1)
    Ku = jax.random.uniform(jax.random.fold_in(key, 1), (P, F, 8)) * (W - 8) + 3
    Kv = jax.random.uniform(jax.random.fold_in(key, 2), (P, F, 8)) * (H - 8) + 3

    flat3 = dI.reshape(F * H * W, 3)
    flat4 = dI4.reshape(F * H * W, 4)
    planar = jnp.transpose(dI, (3, 0, 1, 2)).reshape(3, F * H * W)

    fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]

    def mkidx(c, Ku, Kv):
        x0 = jnp.clip(jnp.floor(Ku + c), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv + c * 0.5), 0, H - 2).astype(jnp.int32)
        idx = fofs + y0 * W + x0
        return jnp.stack([idx, idx + 1, idx + W, idx + W + 1], 0)

    # A: current — stacked-corner row take from (M, 3)
    def take_rows3(c, flat3, Ku, Kv):
        idx4 = mkidx(c, Ku, Kv)
        out = jnp.take(flat3, idx4, axis=0)
        return jnp.sum(out)

    # B: row take from (M, 4) padded rows
    def take_rows4(c, flat4, Ku, Kv):
        idx4 = mkidx(c, Ku, Kv)
        out = jnp.take(flat4, idx4, axis=0)
        return jnp.sum(out[..., :3])

    # C: planar — 3 separate 1-D takes with the same indices
    def take_planar(c, planar, Ku, Kv):
        idx4 = mkidx(c, Ku, Kv)
        tot = jnp.float32(0.0)
        for ch in range(3):
            tot += jnp.sum(jnp.take(planar[ch], idx4, axis=0))
        return tot

    # D: flat 1-D take with channel folded into the index (M*3 vector)
    flat1 = flat3.reshape(-1)

    def take_flat1(c, flat1, Ku, Kv):
        idx4 = mkidx(c, Ku, Kv)
        tot = jnp.float32(0.0)
        for ch in range(3):
            tot += jnp.sum(jnp.take(flat1, idx4 * 3 + ch, axis=0))
        return tot

    timed(take_rows3, "rows C=3 (current)", flat3, Ku, Kv)
    timed(take_rows4, "rows C=4 (padded)", flat4, Ku, Kv)
    timed(take_planar, "planar 3x 1-D takes", planar, Ku, Kv)
    timed(take_flat1, "flat 1-D, channel-folded idx", flat1, Ku, Kv)
    # gradient channels are only needed for ACTIVE residual rows; color for
    # all. Upper bound check:色 color-only gather cost
    def take_color(c, planar, Ku, Kv):
        idx4 = mkidx(c, Ku, Kv)
        return jnp.sum(jnp.take(planar[0], idx4, axis=0))

    timed(take_color, "color-only 1-D take", planar, Ku, Kv)


def main2():
    """Corner-packed rows: flat12[i] = [flat[i], flat[i+1], flat[i+W],
    flat[i+W+1]] x 3ch -> ONE row per tap (4x fewer gather rows)."""
    key = jax.random.PRNGKey(0)
    dI = jax.random.uniform(key, (F, H, W, 3), jnp.float32)
    Ku = jax.random.uniform(jax.random.fold_in(key, 1), (P, F, 8)) * (W - 8) + 3
    Kv = jax.random.uniform(jax.random.fold_in(key, 2), (P, F, 8)) * (H - 8) + 3
    flat3 = dI.reshape(F * H * W, 3)
    M = F * H * W

    def shift(a, k):
        return jnp.concatenate([a[k:], jnp.zeros((k, a.shape[1]))], 0)

    flat12 = jnp.concatenate(
        [flat3, shift(flat3, 1), shift(flat3, W), shift(flat3, W + 1)], -1)
    flat12 = jax.block_until_ready(flat12)

    fofs = (jnp.arange(F, dtype=jnp.int32) * (H * W))[None, :, None]

    def take12(c, flat12, Ku, Kv):
        x0 = jnp.clip(jnp.floor(Ku + c), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv + c * 0.5), 0, H - 2).astype(jnp.int32)
        idx = fofs + y0 * W + x0
        out = jnp.take(flat12, idx, axis=0)      # (P,F,8,12)
        return jnp.sum(out)

    def build12(c, flat3):
        f = flat3 + c * 1e-9
        out = jnp.concatenate(
            [f, shift(f, 1), shift(f, W), shift(f, W + 1)], -1)
        return jnp.sum(out) * 1e-9

    timed(take12, "corner-packed rows C=12", flat12, Ku, Kv)
    timed(build12, "  (build cost of the 12-ch pack)", flat3)

    # 2-row variant: pack horizontal corner pairs only (C=6), take idx and
    # idx+W rows
    flat6 = jnp.concatenate([flat3, shift(flat3, 1)], -1)
    flat6 = jax.block_until_ready(flat6)

    def take6(c, flat6, Ku, Kv):
        x0 = jnp.clip(jnp.floor(Ku + c), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(Kv + c * 0.5), 0, H - 2).astype(jnp.int32)
        idx = fofs + y0 * W + x0
        idx2 = jnp.stack([idx, idx + W], 0)
        out = jnp.take(flat6, idx2, axis=0)      # (2,P,F,8,6)
        return jnp.sum(out)

    timed(take6, "corner-pair rows C=6 (2 takes)", flat6, Ku, Kv)


if __name__ == "__main__":
    if os.environ.get("PROBE2") == "1":
        main2()
    else:
        main()
