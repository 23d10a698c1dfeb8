"""IO-layer tests: camera model parsing + undistortion against the
reference's actual dataset calibration bundles, photometric correction."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.io import undistort as UD

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke


REF = "/root/reference/tests"


class TestModels:
    def test_pinhole_identity(self):
        pars = np.array([400.0, 400.0, 320.0, 240.0, 0.0])
        K = np.eye(3)
        K[0, 0] = K[1, 1] = 400.0
        K[0, 2], K[1, 2] = 320.0, 240.0
        x, y = UD.distort_pinhole((np.array([100.0]), np.array([80.0])),
                                  pars, K)
        np.testing.assert_allclose([x[0], y[0]], [100.0, 80.0], atol=1e-9)

    def test_radtan_center_fixed(self):
        pars = np.array([400.0, 400.0, 320.0, 240.0, -0.28, 0.07, 1e-4, 1e-5])
        K = np.eye(3); K[0, 0] = K[1, 1] = 350.0; K[0, 2] = 320; K[1, 2] = 240
        x, y = UD.distort_radtan((np.array([320.0]), np.array([240.0])),
                                 pars, K)
        np.testing.assert_allclose([x[0], y[0]], [320.0, 240.0], atol=1e-6)

    def test_equidistant_monotone(self):
        pars = np.array([200.0, 200.0, 256.0, 256.0,
                         0.0035, 0.0007, -0.002, 0.0002])
        K = np.eye(3); K[0, 0] = K[1, 1] = 180.0; K[0, 2] = K[1, 2] = 256.0
        xs = np.linspace(256, 500, 50)
        dx, _ = UD.distort_equidistant((xs, np.full(50, 256.0)), pars, K)
        assert np.all(np.diff(dx) > 0)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
class TestReferenceCalibs:
    def test_euroc_radtan_crop(self):
        und = UD.load_undistorter(f"{REF}/EuRoC/camera0.txt")
        assert und.model == "RadTan"
        assert (und.w, und.h) == (752, 480)
        # relative calib rescaled
        assert und.pars[0] > 100
        # remap center lands near the distorted center
        cx, cy = und.K[0, 2], und.K[1, 2]
        assert 0 < cx < und.w and 0 < cy < und.h
        # most of the output is valid under crop
        assert und.remap_valid.mean() > 0.95

    def test_kitti_pinhole(self):
        und = UD.load_undistorter(f"{REF}/KITTI/0_2/camera0.txt")
        assert und.model == "Pinhole"
        assert (und.w, und.h) == (1232, 368)
        assert und.remap_valid.mean() > 0.95

    def test_tumvi_equidistant(self):
        und = UD.load_undistorter(f"{REF}/TUMVI/camera0.txt")
        assert und.model == "EquiDistant"
        assert (und.w, und.h) == (512, 512)

    def test_tumvi_photometric(self):
        ph = UD.PhotometricUndistorter(
            f"{REF}/TUMVI/pcalib0.txt", f"{REF}/TUMVI/vignette0.png",
            w=512, h=512, mode=2)
        assert ph.valid
        img = np.full((512, 512), 128, np.uint8)
        out, exp = ph.process(img)
        assert out.shape == (512, 512)
        assert np.isfinite(out).all()
        # vignette correction brightens the corners relative to center
        assert out[0, 0] >= out[256, 256] - 1e-3

    def test_full_output_mode(self, tmp_path):
        """'full' output calibration (Undistort.cpp:674,773-775): the output
        covers the whole input FOV — wider than crop, and every input border
        pixel's undistorted position lands inside the output frame."""
        with open(f"{REF}/EuRoC/camera0.txt") as f:
            lines = f.read().splitlines()
        lines[2] = "full"
        calib = tmp_path / "camera_full.txt"
        calib.write_text("\n".join(lines) + "\n")
        und_full = UD.load_undistorter(str(calib))
        und_crop = UD.load_undistorter(f"{REF}/EuRoC/camera0.txt")
        # full keeps MORE field of view -> smaller focal length than crop
        assert und_full.K[0, 0] < und_crop.K[0, 0]
        assert und_full.K[1, 1] < und_crop.K[1, 1]
        # full mode admits out-of-input regions (masked invalid), crop ~none
        assert und_full.remap_valid.mean() < und_crop.remap_valid.mean()
        # every input border pixel maps inside the output frame: invert the
        # distortion for a few border pixels and apply the full-mode K
        fn = UD._distort_fn(und_full.model)
        bx = np.array([0.0, und_full.w_org - 1.0, 0.0, und_full.w_org - 1.0])
        by = np.array([0.0, 0.0, und_full.h_org - 1.0, und_full.h_org - 1.0])
        fx, fy, cx, cy = und_full.pars[:4]
        ix, iy = (bx - cx) / fx, (by - cy) / fy
        for _ in range(50):
            px, py = fn((ix, iy), und_full.pars, np.eye(3))
            ix -= (px - bx) / fx
            iy -= (py - by) / fy
        ox = und_full.K[0, 0] * ix + und_full.K[0, 2]
        oy = und_full.K[1, 1] * iy + und_full.K[1, 2]
        assert np.all(ox >= -1.0) and np.all(ox <= und_full.w)
        assert np.all(oy >= -1.0) and np.all(oy <= und_full.h)

    def test_undistort_roundtrip(self):
        """Undistorting a smooth synthetic image keeps values in range and
        fills the valid region."""
        und = UD.load_undistorter(f"{REF}/EuRoC/camera0.txt")
        yy, xx = np.mgrid[0:und.h_org, 0:und.w_org]
        img = (128 + 100 * np.sin(xx / 30) * np.cos(yy / 25)).astype(np.float32)
        out = np.asarray(und.undistort(jnp.asarray(img)))
        assert out.shape == (und.h, und.w)
        v = und.remap_valid
        assert out[v].min() >= img.min() - 1 and out[v].max() <= img.max() + 1
