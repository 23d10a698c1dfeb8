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


def _shift2(a, dy: int, dx: int):
    """Zero-padded 2-D shift (the dilation neighbors; border semantics are
    irrelevant — the template extraction masks a 2-px border)."""
    h, w = a.shape
    if dy > 0:
        a = jnp.concatenate([a[dy:], jnp.zeros((dy, w), a.dtype)], 0)
    elif dy < 0:
        a = jnp.concatenate([jnp.zeros((-dy, w), a.dtype), a[:dy]], 0)
    if dx > 0:
        a = jnp.concatenate([a[:, dx:], jnp.zeros((h, dx), a.dtype)], 1)
    elif dx < 0:
        a = jnp.concatenate([jnp.zeros((h, -dx), a.dtype), a[:, :dx]], 1)
    return a


def _template_level_kernel(diag: bool):
    """Fused makeCoarseDepthL0 per-level tail (CoarseTracker.cpp:100-230):
    one-pass dilation of the scattered idepth/weight maps + normalization
    + the good-pixel mask, in one VMEM pass instead of ~15 full-map XLA
    ops per level."""
    rolls = [(1, 1), (-1, -1), (1, -1), (-1, 1)] if diag else \
            [(0, 1), (0, -1), (1, 0), (-1, 0)]

    def kernel(idm_ref, wm_ref, color_ref, idn_ref, good_ref):
        idm, wm, color = idm_ref[:], wm_ref[:], color_ref[:]
        h, w = idm.shape
        s = jnp.zeros_like(idm)
        c = jnp.zeros_like(wm)
        n = jnp.zeros_like(wm)
        for dy, dx in rolls:
            wn = _shift2(wm, dy, dx)
            idn_ = _shift2(idm, dy, dx)
            has = wn > 0
            s = s + jnp.where(has, idn_, 0.0)
            c = c + jnp.where(has, wn, 0.0)
            n = n + has
        empty = wm <= 0
        fill = empty & (n > 0)
        idm2 = jnp.where(fill, s / jnp.maximum(n, 1), idm)
        wm2 = jnp.where(fill, c / jnp.maximum(n, 1), wm)

        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        border = (col >= 2) & (col < w - 2) & (row >= 2) & (row < h - 2)
        idn = jnp.where(wm2 > 0, idm2 / jnp.maximum(wm2, 1e-12), -1.0)
        good = border & (idn > 0) & jnp.isfinite(color)
        idn_ref[:] = idn
        good_ref[:] = good.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("diag", "interpret"))
def template_level(idm: jnp.ndarray, wm: jnp.ndarray, color: jnp.ndarray,
                   diag: bool, interpret: bool = False):
    """(id_map, w_map, color) -> (idn, good) for one template level."""
    mem = {} if (interpret or _VMEM is None) else dict(memory_space=_VMEM)
    idn, good = pl.pallas_call(
        _template_level_kernel(diag),
        out_shape=(
            jax.ShapeDtypeStruct(idm.shape, jnp.float32),
            jax.ShapeDtypeStruct(idm.shape, jnp.float32),
        ),
        in_specs=[pl.BlockSpec(**mem), pl.BlockSpec(**mem),
                  pl.BlockSpec(**mem)],
        out_specs=(pl.BlockSpec(**mem), pl.BlockSpec(**mem)),
        interpret=interpret,
    )(idm, wm, color)
    return idn, good > 0.5


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
