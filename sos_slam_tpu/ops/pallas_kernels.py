"""Pallas TPU kernels for the dense per-frame image ops.

The per-frame hot path starts with the pyramid build (makeImages,
HessianBlocks.cpp:121-176): per level, central-difference gradients, squared
gradient magnitude, and the 2x box downsample for the next level. As separate
XLA ops each reads the level image from HBM again; this kernel fuses the
products into ONE VMEM pass per level (one HBM read) — the pattern the
reference's SSE loop achieves on CPU cache lines.

Lowering notes (Mosaic):
  * no scatter — border zeroing is a concatenate / iota-mask;
  * the 2x2 box downsample is two small matmuls with averaging operators
    (D_h @ img @ D_w^T) riding the MXU (a strided reshape doesn't lower);
  * outputs are PLANAR (H, W) maps: a packed (H, W, 3) VMEM block pads the
    3-channel minor dim to 128 lanes (42x memory blowup — 157 MB for VGA,
    over the 128 MB VMEM budget). The caller stacks [I, dx, dy] in XLA.

A full VGA float32 level (1.2 MB planar) fits comfortably in VMEM; coarser
levels shrink 4x each.

Enable on the device path with SOS_SLAM_PALLAS=1 (default off: the remote-
compile TPU path used in this container adds compile latency per program;
correctness is covered by interpret-mode tests either way).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable builds
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def pallas_enabled() -> bool:
    """Use the fused Pallas pyramid on the device path.

    Default ON on TPU backends (measured 1.34 ms vs 19.6 ms for the XLA
    form at VGA/6 levels — scripts/probe_pallas.py), OFF elsewhere (the
    XLA form is fine on CPU and Mosaic doesn't lower there). Override
    with SOS_SLAM_PALLAS=0/1."""
    if pltpu is None:
        return False
    v = os.environ.get("SOS_SLAM_PALLAS")
    if v is not None:
        return v == "1"
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pyramid_level_kernel(img_ref, dh_ref, dwT_ref, dx_ref, dy_ref, asg_ref,
                          down_ref):
    img = img_ref[:]
    h, w = img.shape

    zc = jnp.zeros((h, 1), img.dtype)
    dx = jnp.concatenate([zc, 0.5 * (img[:, 2:] - img[:, :-2]), zc], axis=1)
    zr = jnp.zeros((1, w), img.dtype)
    dy = jnp.concatenate([zr, 0.5 * (img[2:, :] - img[:-2, :]), zr], axis=0)
    # the reference fills flat idx in [w, w*(h-1)) only: zero dx's first and
    # last rows too
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    dx = jnp.where((row > 0) & (row < h - 1), dx, 0.0)

    dx_ref[:] = dx
    dy_ref[:] = dy
    asg_ref[:] = dx * dx + dy * dy
    # 2x2 box downsample as averaging operators on the MXU
    t = jnp.dot(dh_ref[:], img, preferred_element_type=jnp.float32)
    down_ref[:] = jnp.dot(t, dwT_ref[:], preferred_element_type=jnp.float32)


def _avg_operator(n: int) -> jnp.ndarray:
    """(n//2, n) matrix averaging adjacent pairs: D @ x = 0.5(x0+x1), ..."""
    i = jnp.arange(n // 2)[:, None]
    j = jnp.arange(n)[None, :]
    return (0.5 * ((j == 2 * i) | (j == 2 * i + 1))).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_pyramid_level(img: jnp.ndarray, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused pass: (H,W) level -> ((H,W,3) [I,dx,dy], (H,W) |grad|^2,
    (H/2,W/2) box-downsampled next level)."""
    h, w = img.shape
    mem = {} if (interpret or _VMEM is None) else \
        dict(memory_space=_VMEM)
    dh = _avg_operator(h)
    dwT = _avg_operator(w).T
    dx, dy, asg, down = pl.pallas_call(
        _pyramid_level_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), img.dtype),
            jax.ShapeDtypeStruct((h, w), img.dtype),
            jax.ShapeDtypeStruct((h, w), img.dtype),
            jax.ShapeDtypeStruct((h // 2, w // 2), img.dtype),
        ),
        in_specs=[pl.BlockSpec(**mem), pl.BlockSpec(**mem),
                  pl.BlockSpec(**mem)],
        out_specs=(pl.BlockSpec(**mem), pl.BlockSpec(**mem),
                   pl.BlockSpec(**mem), pl.BlockSpec(**mem)),
        interpret=interpret,
    )(img, dh, dwT)
    return jnp.stack([img, dx, dy], axis=-1), asg, down


def build_pyramid_pallas(image: jnp.ndarray, n_levels: int,
                         interpret: bool = False):
    """Drop-in for ops.image.build_pyramid using the fused kernel."""
    levels = []
    absgrads = []
    cur = image.astype(jnp.float32)
    for lvl in range(n_levels):
        dI, asg, down = fused_pyramid_level(cur, interpret=interpret)
        levels.append(dI)
        absgrads.append(asg)
        cur = down
    return tuple(levels), tuple(absgrads)
