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
