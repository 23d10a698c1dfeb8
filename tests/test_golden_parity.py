"""Golden-value parity vs the COMPILED C++ reference.

The harnesses in golden/ compile the ROS-free reference units
(thirdparty/Sophus, src/util/Undistort.cpp, the spline IMU init in
src/FullSystem/HessianBlocks.cpp, src/FullSystem/PixelSelector2.cpp) with
g++ and print reference-computed values; these tests assert the JAX
implementations reproduce them. This substitutes for the impossible
EuRoC-vs-reference run (no datasets/ROS in this environment) and directly
de-risks the 5%-ATE parity claim (VERDICT r2 next-round item 4).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden"))

import build as golden_build  # noqa: E402

pytestmark = pytest.mark.skipif(
    not golden_build.available(),
    reason="g++ / reference / Eigen headers unavailable")

REF_TESTS = "/root/reference/tests"


# ---------------------------------------------------------------------------
# Sophus SE3/Sim3 vs utils/lie.py
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sophus_lines():
    return golden_build.run("sophus").splitlines()


def test_se3_exp_log_adj_match_sophus(sophus_lines):
    from sos_slam_tpu.utils import lie
    rows = [list(map(float, ln.split()[1:])) for ln in sophus_lines
            if ln.startswith("se3 ")]
    assert len(rows) == 32
    for vals in rows:
        xi = np.array(vals[:6])
        M_ref = np.array(vals[6:22]).reshape(4, 4)
        log_ref = np.array(vals[22:28])
        adj_ref = np.array(vals[28:64]).reshape(6, 6)
        M = lie.np_se3_exp(xi)
        np.testing.assert_allclose(M, M_ref, atol=1e-12)
        lg = lie.np_se3_log(M_ref)
        np.testing.assert_allclose(lg, log_ref, atol=1e-9)
        # se3_adj is a jnp op (f32 without the x64 flag): f32 tolerance
        A = np.asarray(lie.se3_adj(np.asarray(M_ref, np.float64)))
        np.testing.assert_allclose(A, adj_ref, atol=1e-5)


def test_sim3_exp_log_match_sophus(sophus_lines):
    import jax.numpy as jnp

    from sos_slam_tpu.utils import lie
    rows = [list(map(float, ln.split()[1:])) for ln in sophus_lines
            if ln.startswith("sim3 ")]
    assert len(rows) == 32
    for vals in rows:
        xi = np.array(vals[:7])
        M_ref = np.array(vals[7:23]).reshape(4, 4)
        log_ref = np.array(vals[23:30])
        M = np.asarray(lie.sim3_exp(jnp.asarray(xi, jnp.float32)))
        np.testing.assert_allclose(M, M_ref, rtol=2e-5, atol=2e-5)
        lg = np.asarray(lie.sim3_log(jnp.asarray(M_ref, jnp.float32)))
        np.testing.assert_allclose(lg, log_ref, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# Undistort: output K + remap for every reference calibration bundle
# ---------------------------------------------------------------------------

CALIBS = [
    f"{REF_TESTS}/EuRoC/camera0.txt",     # RadTan, crop
    f"{REF_TESTS}/EuRoC/camera1.txt",
    f"{REF_TESTS}/TUMVI/camera0.txt",     # EquiDistant
    f"{REF_TESTS}/KITTI/0_2/camera0.txt", # Pinhole
    f"{REF_TESTS}/Malaga/camera0.txt",
    f"{REF_TESTS}/RobotCar/camera0.txt",
]
CALIBS = [c for c in CALIBS if os.path.exists(c)]


@pytest.mark.parametrize("calib", CALIBS, ids=[
    "-".join(c.split("/")[-2:]) for c in CALIBS])
def test_undistort_K_and_remap_match_reference(calib):
    from sos_slam_tpu.io.undistort import load_undistorter
    out = golden_build.run("undistort", calib)
    K_ref = size_ref = None
    samples = []
    for ln in out.splitlines():
        if ln.startswith("K "):
            K_ref = np.array(list(map(float, ln.split()[1:])))
        elif ln.startswith("size "):
            t = ln.split()
            size_ref = (int(t[1]), int(t[2]), int(t[4]), int(t[5]))
        elif ln.startswith("m "):
            samples.append(list(map(float, ln.split()[1:])))
    assert K_ref is not None and samples

    und = load_undistorter(calib)
    assert (und.w, und.h, und.w_org, und.h_org) == size_ref
    # the reference iterates makeOptimalK_crop in float32; ours runs float64
    np.testing.assert_allclose(
        [und.K[0, 0], und.K[1, 1], und.K[0, 2], und.K[1, 2]], K_ref,
        rtol=5e-3)
    s = np.array(samples)  # columns: out_x, out_y, in_x, in_y
    ours = np.stack([und.remap_x[s[:, 1].astype(int), s[:, 0].astype(int)],
                     und.remap_y[s[:, 1].astype(int), s[:, 0].astype(int)]],
                    -1)
    # sub-pixel agreement on the remap wherever K agrees exactly; the crop-K
    # float32/float64 difference shifts the map by |dK| * normalized coord,
    # bounded well under half a pixel for these calibrations
    err = np.abs(ours - s[:, 2:4])
    assert np.nanmax(err) < 0.5, np.nanmax(err)
    # and the median error is tiny (no systematic model mismatch)
    assert np.nanmedian(err) < 0.05


# ---------------------------------------------------------------------------
# Spline IMU initialization + evaluators vs models/imu.py
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def spline_out():
    lines = golden_build.run("spline").splitlines()
    poses = {}
    imu = {i: [] for i in range(5)}
    frames = {}
    evals = []
    scale = ok = None
    for ln in lines:
        t = ln.split()
        if ln.startswith("pose "):
            poses[int(t[1])] = (float(t[2]),
                                np.array(list(map(float, t[3:19]))).reshape(4, 4))
        elif ln.startswith("imu "):
            imu[int(t[1])].append(list(map(float, t[2:9])))
        elif ln.startswith("frame "):
            vals = list(map(float, [x for x in t[2:] if x not in
                                    ("vel", "lrot", "bias", "q", "c")]))
            frames[int(t[1])] = dict(vel=vals[0:3], lrot=vals[3:6],
                                     bias=vals[6:12], q=vals[12:18],
                                     c=vals[18:24])
        elif ln.startswith("eval "):
            vals = list(map(float, [x for x in t[1:] if x not in
                                    ("acc", "gyro", "tw", "R")]))
            evals.append(dict(t=vals[0], acc=vals[1:4], gyro=vals[4:7],
                              tw=vals[7:10], R=np.array(vals[10:19]).reshape(3, 3)))
        elif ln.startswith("scale "):
            scale = float(t[1])
        elif ln.startswith("ok "):
            ok = int(t[1])
    return poses, imu, frames, evals, scale, ok


@pytest.fixture(scope="module")
def our_init(spline_out):
    import jax.numpy as jnp

    from sos_slam_tpu.models import imu as IM
    from sos_slam_tpu.ops import ba as B
    from sos_slam_tpu.utils.config import default_settings
    from tests.test_imu import _bare_ba

    poses, imu_samples, _, _, _, _ = spline_out
    settings = default_settings(weight_imu_dso=6.0)
    F = 8
    ts = np.array([poses[i][0] for i in range(5)])
    pose_mats = jnp.stack([jnp.asarray(poses[i][1], jnp.float32)
                           for i in range(5)])
    ba, _, _, _ = _bare_ba(pose_mats, 5)

    acc = np.zeros((F, IM.N_IMU, 3), np.float32)
    gyro = np.zeros((F, IM.N_IMU, 3), np.float32)
    ts_rel = np.zeros((F, IM.N_IMU), np.float32)
    valid = np.zeros((F, IM.N_IMU), bool)
    for i in range(5):
        for k, s in enumerate(imu_samples[i]):
            ts_rel[i, k] = s[0] - ts[i]
            acc[i, k] = s[1:4]
            gyro[i, k] = s[4:7]
            valid[i, k] = True
    imu = IM.empty_imu(F)._replace(
        timestamps=jnp.asarray(np.pad(ts, (0, F - 5)), jnp.float32),
        acc=jnp.asarray(acc), gyro=jnp.asarray(gyro),
        ts=jnp.asarray(ts_rel), imu_valid=jnp.asarray(valid))
    imu2, ok = IM.initialize_imu(ba, imu, settings)
    return IM, imu2, ok


def test_spline_init_matches_reference(spline_out, our_init):
    _, _, frames_ref, _, scale_ref, ok_ref = spline_out
    IM, imu2, ok = our_init
    assert bool(ok) == bool(ok_ref)
    s_scaled = np.asarray(imu2.state * np.asarray(IM.IMU_SCALE21))
    vel = np.asarray(imu2.vel)
    for i in range(5):
        ref = frames_ref[i]
        np.testing.assert_allclose(vel[i], ref["vel"], atol=2e-4)
        np.testing.assert_allclose(s_scaled[i, 6:9], ref["lrot"], atol=2e-4)
        np.testing.assert_allclose(s_scaled[i, 3:6], ref["bias"][3:6],
                                   atol=2e-4)   # gyro bias
        np.testing.assert_allclose(s_scaled[i, 0:3], ref["bias"][0:3],
                                   atol=1e-6)   # acc bias = 0
        np.testing.assert_allclose(
            s_scaled[i, 9:15], np.asarray(ref["q"])[[0, 1, 2, 3, 4, 5]],
            atol=2e-4)
        np.testing.assert_allclose(s_scaled[i, 15:21], ref["c"], atol=2e-4)
    scale = float(imu2.scale) * IM.SCALE_SCALE
    assert abs(scale - scale_ref) < 1e-3, (scale, scale_ref)


def test_spline_evaluators_match_reference(spline_out, our_init):
    import jax.numpy as jnp

    from sos_slam_tpu.models import imu as IM_mod
    _, _, _, evals, _, _ = spline_out
    IM, imu2, _ = our_init
    base = imu2.state[4]
    vel4 = imu2.vel[4]
    for ev in evals:
        t = jnp.float32(ev["t"])
        np.testing.assert_allclose(
            np.asarray(IM_mod.spline_acc(base, t)), ev["acc"], atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(IM_mod.spline_gyro(base, t)), ev["gyro"], atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(IM_mod.spline_t_c2t(base, vel4, t)), ev["tw"],
            atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(IM_mod.spline_rot_c_t(base, t)), ev["R"], atol=3e-4)


# ---------------------------------------------------------------------------
# Pixel-selector histogram thresholds + gradient pyramid vs ops/selector.py
# ---------------------------------------------------------------------------

def _harness_image(W=256, H=192):
    """The integer-derived test image of harness_selector.cpp — bitwise
    reproducible in numpy float32."""
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    ramp = (x * 7 + y * 13) % 97
    noise = ((x * 73856093).astype(np.uint32)
             ^ (y * 19349663).astype(np.uint32)) % np.uint32(29)
    return (np.float32(0.5) * ramp.astype(np.float32)
            + noise.astype(np.float32))


@pytest.fixture(scope="module")
def selector_out():
    lines = golden_build.run("selector").splitlines()
    asg_sum = None
    asg = []
    ths = {}
    for ln in lines:
        t = ln.split()
        if ln.startswith("asg_sum "):
            asg_sum = float(t[1])
        elif ln.startswith("asg "):
            asg.append((int(t[1]), int(t[2]), float(t[3])))
        elif ln.startswith("ths "):
            ths[(int(t[1]), int(t[2]))] = (float(t[3]), float(t[4]))
    return asg_sum, asg, ths


def test_gradient_pyramid_matches_reference(selector_out):
    import jax.numpy as jnp

    from sos_slam_tpu.ops.image import build_pyramid
    asg_sum, asg, _ = selector_out
    img = _harness_image()
    _, absgrads = build_pyramid(jnp.asarray(img), 3)
    a0 = np.asarray(absgrads[0])
    for x, y, v in asg:
        assert abs(a0[y, x] - v) <= 1e-3 * max(1.0, abs(v)), (x, y, a0[y, x], v)
    ours_sum = float(a0[1:-1, 1:-1].sum())
    assert abs(ours_sum - asg_sum) / asg_sum < 1e-5


def test_selector_thresholds_match_reference(selector_out):
    import jax.numpy as jnp

    from sos_slam_tpu.ops.image import build_pyramid
    from sos_slam_tpu.ops.selector import block_thresholds
    from sos_slam_tpu.utils.config import default_settings
    _, _, ths_ref = selector_out
    s = default_settings()
    img = _harness_image()
    _, absgrads = build_pyramid(jnp.asarray(img), 3)
    sm = np.asarray(block_thresholds(absgrads[0], s.min_grad_hist_cut,
                                     s.min_grad_hist_add))
    w32, h32 = 256 // 32, 192 // 32
    ref = np.array([[ths_ref[(x, y)][1] for x in range(w32)]
                    for y in range(h32)])
    np.testing.assert_allclose(sm, ref, rtol=1e-5, atol=1e-4)
