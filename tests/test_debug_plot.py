"""Window / tracking debug visualizations (io/debug_plot.py — the analog
of debugPlot / debugPlotTracking, FullSystemDebugStuff.cpp:47,104)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.io import debug_plot as DP
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192


@pytest.fixture(scope="module")
def tracked_fs():
    calib = synthetic.default_calib(W, H)
    settings = default_settings(
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096, desired_point_density=400.0,
        desired_immature_density=400.0)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    imgs, _, _ = synthetic.make_sequence(calib, 14, twist, plane_z=2.0)
    fs = FullSystem(calib, settings)
    for i in range(14):
        fs.add_active_frame(imgs[i], timestamp=i * 0.05, frame_id=i)
    fs.finish_pending()
    assert fs.initialized and not fs.is_lost
    return fs


def test_rainbow_colormap():
    c = DP.rainbow(np.array([-1.0, 0.0, 0.5, 1.5, 2.5, 3.5]))
    assert c.shape == (6, 3) and c.dtype == np.uint8
    assert (c[0] == 255).all() and (c[1] == 255).all()   # non-positive: white
    assert tuple(c[2]) == (127, 127, 0)                  # phase 0 midpoint
    assert tuple(c[3]) == (0, 127, 127)                  # phase 1
    assert tuple(c[4]) == (127, 0, 127)                  # phase 2
    assert tuple(c[5]) == (127, 127, 0)                  # cycles mod 3


def test_render_window_modes(tracked_fs):
    fs = tracked_fs
    n = int(np.asarray(fs.ba.frame_valid).sum())
    for mode in (0, 3, 4):
        imgs = DP.render_window(fs, mode=mode)
        assert len(imgs) == n
        for im in imgs:
            assert im.shape == (H, W, 3) and im.dtype == np.uint8
    # mode 0 must actually paint points (colored pixels differ from gray)
    im = DP.render_window(fs, mode=0)[0]
    colored = (im.max(-1).astype(int) - im.min(-1)) > 0
    assert colored.sum() > 20, "no idepth points painted"


def test_render_tracking_paints_residuals(tracked_fs):
    fs = tracked_fs
    imgs = DP.render_tracking(fs)
    assert len(imgs) == int(np.asarray(fs.ba.frame_valid).sum())
    painted = 0
    for im in imgs:
        colored = (im.max(-1).astype(int) - im.min(-1)) > 0
        painted += int(colored.sum())
    assert painted > 50, "no residual projections painted"


def test_dumper_writes_pngs(tracked_fs, tmp_path):
    d = DP.DebugPlotDumper(str(tmp_path), mode=0, tracking=True)
    d.dump(tracked_fs)
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("win_") for f in files)
    assert any(f.name.startswith("trk_") for f in files)
