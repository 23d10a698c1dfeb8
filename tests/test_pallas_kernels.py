"""Pallas fused pyramid kernel vs the reference ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.ops import image as imops
from sos_slam_tpu.ops import pallas_kernels as PK


def test_fused_level_matches_reference_ops():
    img = jax.random.uniform(jax.random.PRNGKey(0), (64, 96)) * 255.0
    dI, asg, down = PK.fused_pyramid_level(img, interpret=True)
    dx, dy = imops.image_gradients(img)
    np.testing.assert_allclose(dI[..., 0], img, atol=1e-6)
    np.testing.assert_allclose(dI[..., 1], dx, atol=1e-5)
    np.testing.assert_allclose(dI[..., 2], dy, atol=1e-5)
    np.testing.assert_allclose(asg, dx * dx + dy * dy, atol=1e-3)
    # the kernel's box downsample is an MXU averaging-matmul; FP order
    # differs from the reshape-mean by ~1 ulp at intensity scale
    np.testing.assert_allclose(down, imops.downsample2x(img), rtol=1e-5,
                               atol=1e-4)


def test_build_pyramid_pallas_matches():
    img = jax.random.uniform(jax.random.PRNGKey(1), (64, 64)) * 255.0
    lv_p, asg_p = PK.build_pyramid_pallas(img, 3, interpret=True)
    lv_r, asg_r = imops.build_pyramid(img, 3)
    for a, b in zip(lv_p, lv_r):
        np.testing.assert_allclose(a, b, atol=1e-4)
    for a, b in zip(asg_p, asg_r):
        np.testing.assert_allclose(a, b, atol=1e-2, rtol=1e-5)


def test_template_level_matches_roll_dilate():
    """template_level (zero-shift dilation) == the roll-based form on
    every in-border pixel (the 2-px border is masked by `good` anyway)."""
    key = jax.random.PRNGKey(2)
    h, w = 60, 80
    # sparse scatter-like maps: ~5% occupied
    occ = jax.random.uniform(key, (h, w)) < 0.05
    wm = jnp.where(occ, jax.random.uniform(jax.random.fold_in(key, 1),
                                           (h, w)) + 0.1, 0.0)
    idm = jnp.where(occ, jax.random.uniform(jax.random.fold_in(key, 2),
                                            (h, w)) * 2.0, 0.0)
    color = jax.random.uniform(jax.random.fold_in(key, 3), (h, w)) * 255.0

    for diag in (False, True):
        idn_k, good_k = PK.template_level(idm, wm, color, diag=diag,
                                          interpret=True)
        # reference: the roll-based dilate from models/window.py
        rolls = [(1, 1), (-1, -1), (1, -1), (-1, 1)] if diag else \
                [(0, 1), (0, -1), (1, 0), (-1, 0)]
        s = jnp.zeros_like(idm)
        c = jnp.zeros_like(wm)
        n = jnp.zeros_like(wm)
        for dy, dx in rolls:
            wn = jnp.roll(wm, (dy, dx), (0, 1))
            idn_ = jnp.roll(idm, (dy, dx), (0, 1))
            has = wn > 0
            s = s + jnp.where(has, idn_, 0.0)
            c = c + jnp.where(has, wn, 0.0)
            n = n + has
        fill = (wm <= 0) & (n > 0)
        idm2 = jnp.where(fill, s / jnp.maximum(n, 1), idm)
        wm2 = jnp.where(fill, c / jnp.maximum(n, 1), wm)
        yi, xi = jnp.arange(h), jnp.arange(w)
        border = ((xi >= 2) & (xi < w - 2))[None, :] & \
                 ((yi >= 2) & (yi < h - 2))[:, None]
        idn_r = jnp.where(wm2 > 0, idm2 / jnp.maximum(wm2, 1e-12), -1.0)
        good_r = border & (idn_r > 0) & jnp.isfinite(color)

        np.testing.assert_array_equal(np.asarray(good_k), np.asarray(good_r))
        inb = np.asarray(border)
        np.testing.assert_allclose(np.asarray(idn_k)[inb],
                                   np.asarray(idn_r)[inb], atol=1e-6)
