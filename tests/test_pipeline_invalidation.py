"""Invalidation paths of the pipelined fused driver (_drain_pending,
models/full_system.py): fallback tracking and selector-rung changes must
reprocess/re-dispatch the in-flight frames so that the depth-3 pipeline
stays bitwise identical to the synchronous path, and a mid-pipeline
tracking loss must drain cleanly.

These paths fire only on rare events (VERDICT r4 weak #4): each test
manufactures the event explicitly and asserts the path actually ran.
"""

import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.models.full_system import FullSystem
from sos_slam_tpu.utils import synthetic
from sos_slam_tpu.utils.config import default_settings

W, H = 256, 192
N_FRAMES = 26
ROLL_FRAME = 14      # post-initialization, mid-sequence


def _settings(**kw):
    base = dict(max_window_frames=8, max_points=512, max_immature=1024,
                max_track_pts=4096, desired_point_density=400.0,
                desired_immature_density=400.0)
    base.update(kw)
    return default_settings(**base)


def _sequence(roll_frame=None, roll_px=0):
    calib = synthetic.default_calib(W, H)
    twist = jnp.array([0.05, 0.02, 0.03, 0.003, 0.006, 0.002])
    imgs, _, poses = synthetic.make_sequence(calib, N_FRAMES, twist,
                                             plane_z=2.0)
    imgs = [np.asarray(im) for im in imgs]
    if roll_frame is not None:
        # an un-modeled jump: every motion hypothesis is far off, the
        # device-side accept rejects and fallback tracking engages
        imgs[roll_frame] = np.roll(imgs[roll_frame], roll_px, axis=1)
    return imgs, poses


def _run(imgs, pipeline, settings=None, instrument=False):
    calib = synthetic.default_calib(W, H)
    fs = FullSystem(calib, settings or _settings())
    fs.pipeline = pipeline
    events = dict(fallback_qlen=[], pots=[])
    if instrument:
        orig_complete = fs._complete_fused

        def complete(p):
            qlen = len(fs._pending_fused)
            redo = orig_complete(p)
            events["fallback_qlen"].append((bool(redo), qlen))
            return redo

        fs._complete_fused = complete
    for i, im in enumerate(imgs):
        fs.add_active_frame(im, timestamp=i * 0.05, frame_id=i)
        events["pots"].append(getattr(fs, "_sel_pot", 3))
        if fs.is_lost or fs.init_failed:
            break
    fs.finish_pending()
    return fs, events


def _assert_bitwise_equal(fs_s, fs_p):
    traj_s, traj_p = fs_s.trajectory(), fs_p.trajectory()
    assert traj_s[:, 0].astype(int).tolist() == \
        traj_p[:, 0].astype(int).tolist(), "keyframe sets differ"
    np.testing.assert_array_equal(traj_s[:, 1:4], traj_p[:, 1:4])
    np.testing.assert_array_equal(np.asarray(fs_s.ba.state),
                                  np.asarray(fs_p.ba.state))
    np.testing.assert_array_equal(np.asarray(fs_s.ba.pt_valid),
                                  np.asarray(fs_p.ba.pt_valid))


def test_fallback_track_reprocesses_in_flight_frames():
    imgs, _ = _sequence(roll_frame=ROLL_FRAME, roll_px=40)
    fs_s, ev_s = _run(imgs, pipeline=False, instrument=True)
    fs_p, ev_p = _run(imgs, pipeline=True, instrument=True)
    assert not fs_p.is_lost and not fs_p.init_failed
    # the rolled frame actually triggered the fallback/redo path...
    assert any(r for r, _ in ev_s["fallback_qlen"]), "no fallback in sync run"
    # ...and in the pipelined run it fired with frames still in flight
    assert any(r and q >= 2 for r, q in ev_p["fallback_qlen"]), \
        ev_p["fallback_qlen"]
    _assert_bitwise_equal(fs_s, fs_p)


def test_selector_rung_change_redispatches_in_flight_frames():
    imgs, _ = _sequence()
    # a density target far above what the scene yields at the default rung
    # forces the one-rung-per-keyframe density adaptation to fire (toward
    # MORE selections — the starving direction loses tracking)
    s = _settings(desired_immature_density=1200.0,
                  desired_point_density=450.0)
    fs_s, ev_s = _run(imgs, pipeline=False, settings=s, instrument=True)
    fs_p, ev_p = _run(imgs, pipeline=True, settings=s, instrument=True)
    assert not fs_p.is_lost and not fs_p.init_failed
    assert len(set(ev_p["pots"])) > 1, "selector rung never moved"
    # no fallback needed for this scenario: the rung path alone must
    # keep the pipeline bitwise equal to sync
    _assert_bitwise_equal(fs_s, fs_p)


def test_lost_mid_pipeline_drains_cleanly():
    imgs, _ = _sequence()
    # non-finite frame mid-pipeline: every hypothesis residual is NaN
    imgs[ROLL_FRAME] = np.full_like(imgs[ROLL_FRAME], np.nan)
    fs_p, ev = _run(imgs, pipeline=True, instrument=True)
    assert fs_p.is_lost
    assert len(fs_p._pending_fused) == 0      # queue fully drained
    # frames after the loss were never processed
    n_shells = len(fs_p.shells)
    assert n_shells <= ROLL_FRAME + fs_p.pipeline_depth + 1
