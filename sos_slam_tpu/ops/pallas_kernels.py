"""Pallas TPU kernels for the dense per-frame image ops.

The per-frame hot path starts with the pyramid build (makeImages,
HessianBlocks.cpp:121-176): per level, central-difference gradients, squared
gradient magnitude, and the 2x box downsample for the next level. As separate
XLA ops each reads the level image from HBM again; this kernel fuses all four
products into ONE VMEM pass per level (one HBM read, four writes) — the
pattern the reference's SSE loop achieves on CPU cache lines.

A full VGA float32 level (1.2 MB) fits comfortably in VMEM, so the kernel
uses a single whole-image block; coarser levels shrink 4x each.

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
    return os.environ.get("SOS_SLAM_PALLAS", "0") == "1" and pltpu is not None


def _pyramid_level_kernel(img_ref, dI_ref, asg_ref, down_ref):
    img = img_ref[:]
    h, w = img.shape

    dx = jnp.zeros_like(img)
    dy = jnp.zeros_like(img)
    dx = dx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    dy = dy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    dx = dx.at[0, :].set(0.0)
    dx = dx.at[h - 1, :].set(0.0)

    dI_ref[..., 0] = img
    dI_ref[..., 1] = dx
    dI_ref[..., 2] = dy
    asg_ref[:] = dx * dx + dy * dy
    # box downsample over the even-cropped extent (odd trailing row/col of
    # an odd-sized coarsest level is dropped, matching h//2 x w//2 output)
    he, we = (h // 2) * 2, (w // 2) * 2
    down_ref[:] = 0.25 * (
        img[0:he:2, 0:we:2] + img[0:he:2, 1:we:2]
        + img[1:he:2, 0:we:2] + img[1:he:2, 1:we:2]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_pyramid_level(img: jnp.ndarray, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused pass: (H,W) level -> ((H,W,3) [I,dx,dy], (H,W) |grad|^2,
    (H/2,W/2) box-downsampled next level)."""
    h, w = img.shape
    mem = {} if (interpret or _VMEM is None) else \
        dict(memory_space=_VMEM)
    return pl.pallas_call(
        _pyramid_level_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w, 3), img.dtype),
            jax.ShapeDtypeStruct((h, w), img.dtype),
            jax.ShapeDtypeStruct((h // 2, w // 2), img.dtype),
        ),
        in_specs=[pl.BlockSpec(**mem)],
        out_specs=(pl.BlockSpec(**mem), pl.BlockSpec(**mem),
                   pl.BlockSpec(**mem)),
        interpret=interpret,
    )(img)


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
