"""Dataset readers for the BASELINE ladder: Malaga + RobotCar folder
formats (configs #5), plus the preset-2 (fast, 424x320) end-to-end run the
RobotCar bundle uses (robotcar.launch preset=2, main.cpp:48-64)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.io.datasets import MalagaReader, RobotCarReader
from sos_slam_tpu.io.launch import load_launch
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke


REF = "/root/reference/tests"


def _write_png(path, arr):
    import imageio.v2 as iio
    iio.imwrite(path, arr.astype(np.uint8))


@pytest.fixture
def malaga_dir(tmp_path):
    d = tmp_path / "malaga" / "Images"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        t = 1261228749.0 + i * 0.05
        img = rng.randint(0, 255, (60, 80))
        _write_png(d / f"img_CAMERA1_{t:.6f}_left.png", img)
        _write_png(d / f"img_CAMERA1_{t:.6f}_right.png", img)
    return str(tmp_path / "malaga")


@pytest.fixture
def robotcar_dir(tmp_path):
    root = tmp_path / "robotcar"
    for side in ("left", "right"):
        (root / "stereo" / side).mkdir(parents=True)
    rng = np.random.RandomState(1)
    stamps = [1418381798086020 + i * 62500 for i in range(4)]
    with open(root / "stereo.timestamps", "w") as f:
        for s in stamps:
            f.write(f"{s} 1\n")
            for side in ("left", "right"):
                _write_png(root / "stereo" / side / f"{s}.png",
                           rng.randint(0, 255, (60, 80)))
    return str(root)


def test_malaga_reader(malaga_dir):
    recs = list(MalagaReader(malaga_dir))
    assert len(recs) == 4
    ts = [r["t"] for r in recs]
    assert ts == sorted(ts)
    assert abs(ts[1] - ts[0] - 0.05) < 1e-6
    assert recs[0]["image"].shape == (60, 80)
    assert recs[0]["image_right"] is not None
    recs_mono = list(MalagaReader(malaga_dir, stereo=False))
    assert recs_mono[0]["image_right"] is None


def test_robotcar_reader(robotcar_dir):
    recs = list(RobotCarReader(robotcar_dir))
    assert len(recs) == 4
    assert abs(recs[1]["t"] - recs[0]["t"] - 0.0625) < 1e-9
    assert recs[0]["image"].shape == (60, 80)
    assert recs[0]["image_right"] is not None


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_malaga_launch():
    cfg = load_launch(f"{REF}/Malaga/malaga.launch",
                      package_root="/root/reference")
    s = cfg.settings
    assert s.enable_scale_opt and s.enable_loop_closure
    assert s.scale_opt_thres == 10.0
    assert s.loop_lidar_range == 40.0
    assert s.loop_cam_mode == "forward"
    assert os.path.exists(cfg.calib0) and os.path.exists(cfg.calib1)


def test_preset2_e2e():
    """The fast preset (800 pts / 424x320 / 4-6 frames) must compile and
    track the synthetic scene — the RobotCar configuration's core."""
    W, H = 424, 320
    settings = default_settings(preset=2, max_points=1024,
                                max_immature=1024, max_track_pts=8192)
    assert settings.desired_point_density == 800.0
    assert settings.max_frames == 6 and settings.min_frames == 4
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.04, 0.016, 0.025, 0.002, 0.005, 0.001])
    n = 26
    imgs, _, poses = synthetic.make_sequence(calib, n, twist, plane_z=2.0)
    fs = FullSystem(calib, settings)
    for i in range(n):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    assert fs.initialized and not fs.is_lost and not fs.init_failed
    traj = fs.trajectory()
    assert len(traj) >= 5
    ids = traj[:, 0].astype(int)
    est, gt = traj[:, 1:4], np.asarray(poses)[ids, :3, 3]
    en, gn = np.linalg.norm(est, axis=1), np.linalg.norm(gt, axis=1)
    nz = gn > 1e-6
    scale = np.median(en[nz] / gn[nz]) if nz.any() else 1.0
    ate = np.sqrt(np.mean(
        np.linalg.norm(est / max(scale, 1e-9) - gt, axis=1) ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.05 * max(path, 1e-9) + 0.01, (ate, path)
