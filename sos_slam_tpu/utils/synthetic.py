"""Synthetic multi-view-consistent scenes for tests and benchmarks.

The reference has no unit tests (SURVEY.md §4); we build the missing test
pyramid on analytic scenes: a textured 3-D plane rendered from arbitrary
camera poses. Images from different poses are exactly photometrically
consistent (same continuous texture evaluated at the ray/plane intersection),
with analytic ground-truth depth — ideal for validating direct alignment,
epipolar tracing, and bundle adjustment without datasets.

World convention: camera looks along +z; the plane is z = plane_z (world).
Texture = sum of smooth sinusoids (band-limited, so bilinear sampling of a
rendered image approximates the analytic value well).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.utils import lie
from sos_slam_tpu.utils.camera import CalibPyramid, make_calib_pyramid


def default_calib(w: int = 640, h: int = 480) -> CalibPyramid:
    return make_calib_pyramid(w, h, fx=0.7 * w, fy=0.7 * w, cx=w / 2 - 0.5,
                              cy=h / 2 - 0.5)


def texture(xy: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
    """Continuous texture T(x, y) in [0, 255], band-limited sinusoid mix."""
    rng = np.random.RandomState(seed)
    n_waves = 24
    freqs = rng.uniform(0.5, 12.0, (n_waves, 2)).astype(np.float32)
    phases = rng.uniform(0, 2 * np.pi, n_waves).astype(np.float32)
    amps = (rng.uniform(0.3, 1.0, n_waves) / np.sqrt(n_waves)).astype(np.float32)
    x, y = xy[..., 0], xy[..., 1]
    acc = jnp.zeros_like(x)
    for i in range(n_waves):
        acc = acc + amps[i] * jnp.sin(freqs[i, 0] * x + freqs[i, 1] * y + phases[i])
    return 128.0 + 100.0 * acc


def render_plane(
    calib: CalibPyramid,
    cam_to_world: jnp.ndarray,
    plane_z: float = 2.0,
    seed: int = 0,
    lvl: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render (image, idepth) for a camera at `cam_to_world` viewing plane z=plane_z.

    Returns image (H, W) in [0, 255] and inverse depth (H, W) in camera frame.
    Pixels whose ray doesn't hit the plane in front get idepth 0 and intensity
    of the clamped intersection (rare for small motions).
    """
    w, h = calib.widths[lvl], calib.heights[lvl]
    fx, fy, cx, cy = calib.intrinsics(lvl)
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    # ray in camera frame
    rc = jnp.stack([(uu - cx) / fx, (vv - cy) / fy, jnp.ones_like(uu)], -1)
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    rw = rc @ R.T  # world-frame ray dirs
    # intersect z = plane_z: t_z + s * rw_z = plane_z
    s = (plane_z - t[2]) / jnp.where(jnp.abs(rw[..., 2]) < 1e-6, 1e-6, rw[..., 2])
    s = jnp.maximum(s, 1e-3)
    pw = t + s[..., None] * rw
    img = texture(pw[..., :2], seed)
    # camera-frame depth of the intersection
    pc = (pw - t) @ R  # = R^T (pw - t)
    z = jnp.maximum(pc[..., 2], 1e-3)
    idepth = 1.0 / z
    return img, idepth


def render_two_planes(
    calib: CalibPyramid,
    cam_to_world: jnp.ndarray,
    z_near: float = 2.0,
    z_far: float = 6.0,
    seed: int = 0,
    lvl: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two textured planes with a vertical depth discontinuity at world x=0
    (x<0 -> z_near, x>=0 -> z_far): multi-view consistent imagery WITH 3-D
    structure (occlusion-free for small lateral motions on the +x side).
    Returns (image, idepth)."""
    w, h = calib.widths[lvl], calib.heights[lvl]
    fx, fy, cx, cy = calib.intrinsics(lvl)
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    rc = jnp.stack([(uu - cx) / fx, (vv - cy) / fy, jnp.ones_like(uu)], -1)
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    rw = rc @ R.T

    def hit(plane_z):
        s = (plane_z - t[2]) / jnp.where(jnp.abs(rw[..., 2]) < 1e-6, 1e-6,
                                         rw[..., 2])
        s = jnp.maximum(s, 1e-3)
        return t + s[..., None] * rw

    p_near = hit(z_near)
    p_far = hit(z_far)
    use_near = p_near[..., 0] < 0.0
    pw = jnp.where(use_near[..., None], p_near, p_far)
    img = jnp.where(use_near, texture(p_near[..., :2], seed),
                    texture(p_far[..., :2], seed + 1))
    pc = (pw - t) @ R
    idepth = 1.0 / jnp.maximum(pc[..., 2], 1e-3)
    return img, idepth


def make_sequence(
    calib: CalibPyramid,
    n_frames: int,
    twist_per_frame=(0.02, 0.01, 0.015, 0.001, 0.002, 0.001),
    plane_z: float = 2.0,
    seed: int = 0,
):
    """Constant-twist trajectory: returns (images (N,H,W), idepths, poses (N,4,4))."""
    xi = jnp.array(twist_per_frame, jnp.float32)
    imgs, idepths, poses = [], [], []
    T = jnp.eye(4, dtype=jnp.float32)
    for _ in range(n_frames):
        img, idp = render_plane(calib, T, plane_z, seed)
        imgs.append(img)
        idepths.append(idp)
        poses.append(T)
        T = (T @ lie.se3_exp(xi)).astype(jnp.float32)
    return jnp.stack(imgs), jnp.stack(idepths), jnp.stack(poses)
