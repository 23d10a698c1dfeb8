"""Native C++ preprocessing kernel vs the Python reference path."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu import native
from sos_slam_tpu.io import undistort as UD

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke


REF = "/root/reference/tests"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def test_native_matches_python_remap(lib):
    und = UD.load_undistorter(f"{REF}/EuRoC/camera0.txt") \
        if os.path.exists(REF) else None
    if und is None:
        pytest.skip("reference not mounted")
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (und.h_org, und.w_org), np.uint8)
    out_native = native.preprocess_frame(
        raw, und.remap_x, und.remap_y, und.remap_valid)
    out_py = np.asarray(und.undistort(jnp.asarray(raw.astype(np.float32))))
    v = und.remap_valid
    np.testing.assert_allclose(out_native[v], out_py[v], atol=1e-2)


def test_native_photometric(lib):
    h, w = 64, 64
    raw = np.full((h, w), 100, np.uint8)
    G = (np.linspace(0, 255, 256) ** 1.2 / 255 ** 0.2).astype(np.float32)
    vig = np.ones((h, w), np.float32) * 2.0
    rx, ry = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    valid = np.ones((h, w), bool)
    out = native.preprocess_frame(raw, rx, ry, valid, G=G, vig_inv=vig)
    expected = G[100] * 2.0
    np.testing.assert_allclose(out[2:-2, 2:-2], expected, atol=1e-3)


def test_native_speed_sane(lib):
    """The fused native path should beat a NumPy LUT + device remap on a
    VGA frame (sanity, generous margin)."""
    import time
    h, w = 480, 640
    raw = np.random.randint(0, 255, (h, w), np.uint8).astype(np.uint8)
    rx, ry = np.meshgrid(np.linspace(0, w - 2, w, dtype=np.float32),
                         np.linspace(0, h - 2, h, dtype=np.float32))
    valid = np.ones((h, w), bool)
    native.preprocess_frame(raw, rx, ry, valid)  # warm
    t0 = time.time()
    for _ in range(10):
        native.preprocess_frame(raw, rx, ry, valid)
    dt = (time.time() - t0) / 10
    assert dt < 0.05, f"native preprocess too slow: {dt*1000:.1f} ms"


def test_scan_voxel_filter_matches_numpy():
    """Native voxel keep-highest filter == the vectorized numpy fallback
    (process_scan_forward analog, ScanContext.cpp:106-178)."""
    import numpy as np
    from sos_slam_tpu import native
    from sos_slam_tpu.loop import scancontext as SC

    if native.get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    n = 5000
    pts_w = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    valid = rng.random(n) < 0.8
    T_cw = np.eye(4, dtype=np.float32)
    T_cw[:3, 3] = [0.5, -0.2, 1.0]
    r = 25.0
    inv_res = np.array([1.0 / SC.RES[0], 1.0 / SC.RES[1], 1.0 / SC.RES[2]])

    keep, pts = native.scan_voxel_filter(pts_w, valid, T_cw, r, inv_res)

    # numpy reference (same algorithm as the ScanAccumulator fallback)
    p_l = pts_w[valid] @ T_cw[:3, :3].T + T_cw[:3, 3]
    src = np.flatnonzero(valid)
    inr = np.einsum("ij,ij->i", p_l, p_l) < r * r
    p_l, src = p_l[inr], src[inr]
    sizes = np.floor(2 * r * inv_res).astype(np.int64) + 1
    idx3 = np.floor((p_l + r) * inv_res).astype(np.int64)
    loc = idx3 @ np.array([1, sizes[0], sizes[0] * sizes[1]])
    order = np.lexsort((p_l[:, 1], loc))
    first = np.ones(len(order), bool)
    first[1:] = loc[order][1:] != loc[order][:-1]
    ref_idx = set(src[order[first]].tolist())

    assert set(keep.tolist()) == ref_idx
    # returned local coordinates match the transform
    chk = pts_w[keep] @ T_cw[:3, :3].T + T_cw[:3, 3]
    np.testing.assert_allclose(pts, chk, rtol=1e-5, atol=1e-4)
