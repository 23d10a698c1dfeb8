"""Launch-file compatibility: parse the reference's actual test bundles."""

import os

import numpy as np
import pytest

from sos_slam_tpu.io.launch import load_launch

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke


REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
class TestLaunch:
    def test_euroc(self):
        cfg = load_launch(f"{REF}/EuRoC/euroc.launch",
                          package_root="/root/reference")
        s = cfg.settings
        assert s.scale_opt_thres == 12.0
        assert s.weight_imu_dso == 6.0
        assert s.enable_imu and s.enable_scale_opt
        assert not s.enable_loop_closure
        assert cfg.calib0.endswith("tests/EuRoC/camera0.txt")
        assert os.path.exists(cfg.calib0)
        # calib.yaml parsed: stereo + imu extrinsics + noise
        assert cfg.T_cam1_cam0 is not None
        np.testing.assert_allclose(cfg.T_cam1_cam0[0, 3], -0.1101)
        assert abs(s.imu_acc_nd - 2.0e-3) < 1e-9
        assert s.imu_freq == 200
        # rot_imu_cam = R(T_cam0_imu)^T
        R = np.array(s.rot_imu_cam).reshape(3, 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)

    def test_kitti(self):
        cfg = load_launch(f"{REF}/KITTI/kitti.launch",
                          package_root="/root/reference")
        s = cfg.settings
        assert s.enable_loop_closure
        assert s.enable_scale_opt
        assert not s.enable_imu
        assert s.loop_lidar_range == 40.0

    def test_robotcar_preset2(self):
        cfg = load_launch(f"{REF}/RobotCar/robotcar.launch",
                          package_root="/root/reference")
        s = cfg.settings
        assert s.preset == 2
        # fast preset applied (main.cpp:48-64)
        assert s.desired_point_density == 800.0
        assert s.max_frames == 6

    def test_tumvi_photometric(self):
        cfg = load_launch(f"{REF}/TUMVI/tumvi.launch",
                          package_root="/root/reference")
        assert cfg.vignette0 and cfg.vignette0.endswith("vignette0.png")
        # the launch points at calibs/TUMVI/pcalib0.txt (resolved correctly;
        # that directory is absent from the reference snapshot)
        assert cfg.gamma0 and cfg.gamma0.endswith("pcalib0.txt")
        assert cfg.settings.weight_imu_dso == 0.1
