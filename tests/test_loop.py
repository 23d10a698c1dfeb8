"""Loop-closure tests: ScanContext descriptor, ICP, SE(3) pose graph."""

import jax.numpy as jnp
import numpy as np

from sos_slam_tpu.loop import pose_estimator as PE
from sos_slam_tpu.loop import pose_graph as PG
from sos_slam_tpu.loop import scancontext as SC
from sos_slam_tpu.utils import lie

RNG = np.random.RandomState(7)


def make_structured_cloud(n=600, seed=0):
    """A structured 'environment' cloud with distinctive height profile
    (tall pillars + ground plane) passing the height-variance gate."""
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(16):
        cx, cz = rng.uniform(-25, 25, 2)
        h = rng.uniform(5, 20)
        for _ in range(25):
            pts.append([cx + rng.randn() * 0.5, -rng.uniform(0, h),
                        cz + rng.randn() * 0.5])
    while len(pts) < n:
        pts.append([rng.uniform(-28, 28), 0.0, rng.uniform(-28, 28)])
    return np.array(pts)


class TestScanContext:
    def test_same_place_low_diff(self):
        cloud = make_structured_cloud()
        T1 = np.eye(4)
        sig1, rk1, ok1 = SC.generate(cloud, SC.pca_align(cloud, T1, False),
                                     30.0)
        # revisit: same cloud observed with small perturbation
        d = cloud + RNG.randn(*cloud.shape) * 0.05
        sig2, rk2, ok2 = SC.generate(d, SC.pca_align(d, T1, False), 30.0)
        assert ok1 and ok2
        _, diff_same = SC.search_sc(sig2, [0], [sig1])
        # different place
        cloud3 = make_structured_cloud(seed=99)
        sig3, _, _ = SC.generate(cloud3, SC.pca_align(cloud3, T1, False), 30.0)
        _, diff_other = SC.search_sc(sig3, [0], [sig1])
        assert diff_same < 0.33, diff_same          # matches threshold
        assert diff_other > diff_same + 0.05, (diff_same, diff_other)

    def test_ringkey_margin(self):
        idx = SC.RingkeyIndex()
        rk = np.linspace(0, 1, SC.NUM_R)
        for i in range(SC.LOOP_MARGIN + 5):
            cands = idx.search_and_insert(rk)
        # only frames older than the margin become searchable
        assert len(idx.keys) == 5
        cands = idx.search_and_insert(rk)
        assert len(cands) >= 1


class TestICP:
    def test_recovers_transform(self):
        cloud = make_structured_cloud(400)[:400]
        T_gt = np.asarray(lie.se3_exp(
            jnp.asarray([0.4, -0.2, 0.3, 0.05, 0.08, -0.04], jnp.float32)))
        moved = (T_gt[:3, :3] @ cloud.T).T + T_gt[:3, 3]
        P = jnp.asarray(cloud, jnp.float32)
        Q = jnp.asarray(moved, jnp.float32)
        v = jnp.ones(len(cloud), bool)
        T_init = jnp.eye(4)
        T_est, ok, err = PE.icp(P, v, Q, v, T_init, max_dist=2.0, n_iters=8)
        assert bool(ok)
        e = np.asarray(lie.se3_log(lie.se3_inv(T_est) @ jnp.asarray(T_gt)))
        assert np.linalg.norm(e) < 0.05, e


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        """Square loop with odometry drift; a loop edge snaps it closed."""
        n = 16
        # ground truth: square path
        gt = [np.eye(4)]
        step = np.asarray(lie.se3_exp(jnp.asarray(
            [1.0, 0, 0, 0, np.pi / 8, 0], jnp.float32)))
        for i in range(1, n):
            gt.append(gt[-1] @ step)
        gt = np.stack(gt)

        # odometry with accumulating drift
        drift = np.asarray(lie.se3_exp(jnp.asarray(
            [0.02, 0.01, -0.015, 0.002, 0.004, 0.0], jnp.float32)))
        odo = [np.eye(4)]
        for i in range(1, n):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            odo.append(odo[-1] @ rel @ drift)
        odo = np.stack(odo)

        N = 16
        T = jnp.asarray(odo, jnp.float32)
        v_valid = jnp.ones(N, bool)
        fixed = jnp.zeros(N, bool).at[0].set(True)

        e_from = list(range(n - 1))
        e_to = list(range(1, n))
        e_meas = [np.linalg.inv(gt[i]) @ gt[i + 1] @ drift
                  for i in range(n - 1)]
        e_info = [np.eye(6) for _ in range(n - 1)]
        # loop edge: exact relative pose between 0 and n-1
        e_from.append(0)
        e_to.append(n - 1)
        e_meas.append(np.linalg.inv(gt[0]) @ gt[n - 1])
        e_info.append(np.eye(6) * 100.0)

        E = 32
        ef = np.zeros(E, np.int32); ef[:len(e_from)] = e_from
        et = np.zeros(E, np.int32); et[:len(e_to)] = e_to
        em = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        em[:len(e_meas)] = np.stack(e_meas)
        ei = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
        ei[:len(e_info)] = np.stack(e_info)
        ev = np.zeros(E, bool); ev[:len(e_from)] = True

        T_opt = PG.optimize_pose_graph(
            T, v_valid, fixed, jnp.asarray(ef), jnp.asarray(et),
            jnp.asarray(em), jnp.asarray(ei), jnp.asarray(ev), n_iters=30)
        T_opt = np.asarray(T_opt)

        err_before = np.linalg.norm(odo[n - 1][:3, 3] - gt[n - 1][:3, 3])
        err_after = np.linalg.norm(T_opt[n - 1][:3, 3] - gt[n - 1][:3, 3])
        assert err_after < 0.35 * err_before, (err_before, err_after)

    def test_chain_without_loops_is_stable(self):
        """Odometry-only graph with last vertex fixed: poses barely move."""
        n = 8
        T = [np.eye(4)]
        step = np.asarray(lie.se3_exp(jnp.asarray(
            [0.5, 0.1, 0.2, 0.02, 0.05, 0.01], jnp.float32)))
        for i in range(1, n):
            T.append(T[-1] @ step)
        T = np.stack(T).astype(np.float32)
        N = 8
        e_from = np.arange(n - 1, dtype=np.int32)
        e_to = np.arange(1, n, dtype=np.int32)
        e_meas = np.tile(step[None], (n - 1, 1, 1)).astype(np.float32)
        e_info = np.tile(np.eye(6, dtype=np.float32)[None], (n - 1, 1, 1))
        fixed = np.zeros(N, bool); fixed[n - 1] = True
        T_opt = PG.optimize_pose_graph(
            jnp.asarray(T), jnp.ones(N, bool), jnp.asarray(fixed),
            jnp.asarray(e_from), jnp.asarray(e_to), jnp.asarray(e_meas),
            jnp.asarray(e_info), jnp.ones(n - 1, bool), n_iters=10)
        np.testing.assert_allclose(np.asarray(T_opt), T, atol=2e-3)
