"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.parallel import sharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ba_matches_single_device():
    import sys
    sys.path.insert(0, "tests")
    import test_ba
    from sos_slam_tpu.models import energy as E

    ba, dI, _, _ = test_ba.build_window(n_frames=3, n_points=96,
                                        pose_noise=0.005)
    mesh = sharded.make_mesh(8)

    ba_s, energy_s = sharded.sharded_gn_step(mesh, ba, dI, test_ba.SETTINGS,
                                             test_ba.W, test_ba.H)
    ba_1, canbreak, energy_1 = E.gn_step(ba, dI, test_ba.SETTINGS,
                                         test_ba.W, test_ba.H)
    # the sharded step must produce the same state update (modulo f32 reduce
    # order)
    np.testing.assert_allclose(np.asarray(ba_s.state),
                               np.asarray(ba_1.state), atol=1e-4)
    np.testing.assert_allclose(float(energy_s), float(energy_1), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vio_matches_single_device():
    """The sharded VIO KKT step must reproduce the single-device step
    (points fanned out on dp; the (5+29F+C) solve replicated)."""
    import __graft_entry__ as ge
    from sos_slam_tpu.models import energy as E

    ba, dI, settings, imu = ge._tiny_window(n_frames=5, n_points=96,
                                            with_imu=True)
    mesh = sharded.make_mesh(8)
    ba_s, imu_s, e_s = sharded.sharded_vio_gn_step(
        mesh, ba, imu, dI, settings, ge._W, ge._H)
    ba_1, imu_1, canbreak, e_1 = E.gn_step_vio(ba, imu, dI, settings,
                                               ge._W, ge._H)
    np.testing.assert_allclose(np.asarray(ba_s.state),
                               np.asarray(ba_1.state), atol=1e-4)
    np.testing.assert_allclose(np.asarray(imu_s.state),
                               np.asarray(imu_1.state), atol=1e-4)
    np.testing.assert_allclose(float(e_s), float(e_1), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharding_layout():
    import sys
    sys.path.insert(0, "tests")
    import test_ba

    ba, _, _, _ = test_ba.build_window(n_frames=3, n_points=96)
    mesh = sharded.make_mesh(8)
    ba_s = sharded.shard_ba(ba, mesh)
    # point arrays sharded over dp; frame arrays replicated
    assert len(ba_s.u.sharding.device_set) == 8
    assert not ba_s.u.sharding.is_fully_replicated
    assert ba_s.state.sharding.is_fully_replicated
