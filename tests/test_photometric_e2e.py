"""End-to-end photometric realism: the synthetic gates in other e2e tests
use clean, perfectly exposed imagery; these runs push realistic camera
effects through the full pipeline —

  * sensor gamma + vignette, inverted by the PhotometricUndistorter
    (reference Undistort.cpp:38-123, TUM-VI's mode-2 configuration),
  * per-frame exposure changes driving the affine brightness states
    (AffLight, NumType.h:149-171),
  * intensity noise + 8-bit quantization.

Tracking must stay within the standard ATE gate, and with unknown exposure
the estimated affine-a states must track the true log-exposure profile.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.io.undistort import PhotometricUndistorter
from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
N_FRAMES = 24
GAMMA = 0.7


def _settings():
    return default_settings(
        max_window_frames=8, max_points=512, max_immature=1024,
        max_track_pts=4096, desired_point_density=400.0,
        desired_immature_density=400.0,
    )


def _vignette(w, h):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
    return 1.0 - 0.35 * r2 / 2.0          # 1.0 center -> ~0.65 corners


def _camera(irradiance, exposure, vig, rng):
    """Forward camera model: vignette x exposure -> gamma -> noise -> 8bit."""
    x = np.clip(np.asarray(irradiance) * vig * exposure, 0.0, 255.0)
    pix = 255.0 * (x / 255.0) ** GAMMA
    pix = pix + rng.randn(*pix.shape) * 1.5
    return np.clip(np.round(pix), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def photo_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("photo")
    # inverse-gamma table: G[p] = 255 (p/255)^(1/GAMMA)  (so G(G_cam(x))=x)
    p = np.arange(256, dtype=np.float64)
    G = 255.0 * (p / 255.0) ** (1.0 / GAMMA)
    G[1:] = np.maximum(G[1:], G[:-1] + 1e-6)   # strictly increasing
    gamma_file = os.path.join(tmp, "pcalib.txt")
    np.savetxt(gamma_file, G)
    vig = _vignette(W, H)
    import imageio.v2 as iio
    vig_file = os.path.join(tmp, "vignette.png")
    iio.imwrite(vig_file, (vig * 65535).astype(np.uint16))

    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    imgs, _, poses = synthetic.make_sequence(calib, N_FRAMES, twist,
                                             plane_z=2.0)
    rng = np.random.RandomState(7)
    exposures = 0.85 + 0.15 * np.sin(np.arange(N_FRAMES) * 0.7)
    raw = [_camera(imgs[i], exposures[i], vig, rng)
           for i in range(N_FRAMES)]
    photo = PhotometricUndistorter(gamma_file, vig_file, w=W, h=H, mode=2)
    assert photo.valid
    return calib, raw, np.asarray(poses), exposures, photo


def _ate_gate(fs, poses):
    traj = fs.trajectory()
    ids = traj[:, 0].astype(int)
    est, gt = traj[:, 1:4], poses[ids, :3, 3]
    en, gn = np.linalg.norm(est, axis=1), np.linalg.norm(gt, axis=1)
    nz = gn > 1e-6
    scale = np.median(en[nz] / gn[nz]) if nz.any() else 1.0
    ate = np.sqrt(np.mean(
        np.linalg.norm(est / max(scale, 1e-9) - gt, axis=1) ** 2))
    path = np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1))
    assert ate < 0.05 * max(path, 1e-9) + 0.012, (ate, path)
    return traj


def test_gamma_vignette_known_exposure(photo_scene):
    """Full photometric chain with the undistorter inverting gamma+vignette
    and the true exposure passed through (TUM-VI mode-2 contract)."""
    calib, raw, poses, exposures, photo = photo_scene
    fs = FullSystem(calib, _settings())
    for i in range(N_FRAMES):
        irr, e = photo.process(raw[i], exposures[i])
        fs.add_active_frame(jnp.asarray(irr), timestamp=i * 0.05,
                            frame_id=i, exposure=e)
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    assert fs.initialized and not fs.is_lost and not fs.init_failed
    _ate_gate(fs, poses)


def test_unknown_exposure_absorbed_by_affine(photo_scene):
    """Same imagery but exposure NOT provided: the per-frame affine-a
    states must absorb it (track the true log-exposure profile)."""
    calib, raw, poses, exposures, photo = photo_scene
    # reference mode-1 configuration (main.cpp:75-80): without exposure
    # data the affine states must be FREE (prior 0), not pinned
    s = _settings()
    import dataclasses
    s = dataclasses.replace(s, affine_opt_mode_a=0.0, affine_opt_mode_b=0.0)
    fs = FullSystem(calib, s)
    for i in range(N_FRAMES):
        irr, _ = photo.process(raw[i], 1.0)
        fs.add_active_frame(jnp.asarray(irr), timestamp=i * 0.05,
                            frame_id=i, exposure=1.0)
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    assert fs.initialized and not fs.is_lost and not fs.init_failed
    _ate_gate(fs, poses)
    a = np.array([sh.aff[0] for sh in fs.shells if sh.pose_valid])
    ids = [sh.id for sh in fs.shells if sh.pose_valid]
    loge = np.log(exposures[ids])
    # affine-a absorbs brightness change up to a constant offset
    if np.std(loge) > 1e-3:
        c = np.corrcoef(a, loge)[0, 1]
        assert abs(c) > 0.8, c
