"""Bisect the epipolar-trace program: which stage costs the 24 ms?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.ops import trace as TR
from sos_slam_tpu.ops.image import interp_bilinear
from sos_slam_tpu.utils.config import PATTERN_OFFSETS, default_settings

N = 2048
S = TR.MAX_STEPS
H, W = 480, 640


def timed(label, fn, k=10):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(k)]
    jax.block_until_ready(outs)
    print(f"{label:44s} {((time.time()-t0)/k)*1e3:8.2f} ms", flush=True)


def main():
    settings = default_settings()
    rng = np.random.default_rng(0)
    dI = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    base = rng.uniform([8, 8], [W - 60, H - 60], size=(N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    dxn = jnp.asarray(np.cos(ang))
    dyn = jnp.asarray(np.sin(ang))
    ptx = jnp.asarray(base[:, 0])
    pty = jnp.asarray(base[:, 1])
    rot_pat = jnp.asarray(
        np.tile(np.asarray(PATTERN_OFFSETS, np.float32), (N, 1, 1)))
    color = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    aff_p = jnp.asarray(np.tile([1.0, 0.0], (N, 1)).astype(np.float32))
    weights = jnp.ones((N, 8), jnp.float32)
    num_steps = jnp.full((N,), 32, jnp.int32)

    @jax.jit
    def sweep_only(dI, ptx, pty, dxn, dyn, rot_pat, color, aff_p, num_steps):
        steps = jnp.arange(S, dtype=jnp.float32)
        sx = ptx[:, None] + steps[None, :] * dxn[:, None]
        sy = pty[:, None] + steps[None, :] * dyn[:, None]
        e = TR._pattern_energy_i(dI[..., 0], sx, sy, rot_pat[:, None],
                                 color[:, None], aff_p[:, None],
                                 settings.huber_th)
        ok = steps[None, :] < num_steps[:, None].astype(jnp.float32)
        e = jnp.where(ok, e, jnp.inf)
        return jnp.argmin(e, -1), jnp.min(e, -1)

    timed("sweep only (N,S,8) energies + argmin",
          lambda: sweep_only(dI, ptx, pty, dxn, dyn, rot_pat, color, aff_p,
                             num_steps))

    @jax.jit
    def gn_only(dI, bu, bv, dxn, dyn, rot_pat, color, aff_p):
        carry = (bu, bv, jnp.full((N,), 1e5), bu, bv, jnp.zeros(N),
                 jnp.zeros(N, bool))

        def gn_body(c):
            bu, bv, be, ubak, vbak, stepback, done = c
            e, hit = TR._pattern_energy(dI, bu, bv, rot_pat, color, aff_p,
                                        settings.huber_th)
            r = hit[..., 0] - (aff_p[:, 0:1] * color + aff_p[:, 1:2])
            ar = jnp.abs(r)
            hw = jnp.where(ar < 9.0, 1.0, 9.0 / jnp.maximum(ar, 1e-9))
            dres = dxn[:, None] * hit[..., 1] + dyn[:, None] * hit[..., 2]
            okm = jnp.isfinite(hit[..., 0])
            Hgn = 1.0 + jnp.sum(jnp.where(okm, hw * dres * dres, 0.0), -1)
            bgn = jnp.sum(jnp.where(okm, hw * r * dres, 0.0), -1)
            ew = jnp.sum(jnp.where(okm, weights ** 2 * hw * r * r * (2 - hw),
                                   1e5), -1)
            step = jnp.clip(-bgn / Hgn, -0.5, 0.5)
            return (bu + step * dxn, bv + step * dyn, ew, bu, bv, step, done)

        for _ in range(3):
            carry = gn_body(carry)
        return carry[0], carry[2]

    timed("GN refinement x3 (N,8,3) gathers",
          lambda: gn_only(dI, ptx, pty, dxn, dyn, rot_pat, color, aff_p))

    # full trace_points for reference, on a synthetic ImmatureState
    imm = TR.ImmatureState(
        valid=jnp.ones(N, bool), host=jnp.zeros(N, jnp.int32),
        u=ptx, v=pty, color=color, weights=weights,
        gradH=jnp.tile(jnp.eye(2)[None], (N, 1, 1)) * 100.0,
        energy_th=jnp.full((N,), 1e4),
        idepth_min=jnp.zeros(N), idepth_max=jnp.full((N,), jnp.inf),
        status=jnp.zeros(N, jnp.int8), quality=jnp.full((N,), 1e4),
        my_type=jnp.ones(N, jnp.int32))
    F = 8
    KRKi = jnp.tile(jnp.eye(3)[None], (F, 1, 1))
    Kt = jnp.tile(jnp.array([0.1, 0.0, 0.01])[None], (F, 1))
    aff = jnp.tile(jnp.array([1.0, 0.0])[None], (F, 1))

    timed("full trace_points",
          lambda: TR.trace_points(imm, dI, KRKi, Kt, aff, W, H, settings))


if __name__ == "__main__":
    main()
