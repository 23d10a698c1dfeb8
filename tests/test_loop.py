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
        # (+1: the reference flann index's initial dummy row)
        assert len(idx.keys) == 6
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


def _pack(edges, E):
    ef = np.zeros(E, np.int32)
    et = np.zeros(E, np.int32)
    em = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ei = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
    ev = np.zeros(E, bool)
    for i, (a, b, m, info) in enumerate(edges):
        ef[i], et[i] = a, b
        em[i] = m
        ei[i] = info
        ev[i] = True
    return (jnp.asarray(ef), jnp.asarray(et), jnp.asarray(em),
            jnp.asarray(ei), jnp.asarray(ev))


def _run_pg(odo, chain, loops, fixed_idx, n_iters=25, N=None, Ec=None,
            El=16):
    n = len(odo)
    N = N or n
    T = jnp.asarray(np.stack(odo), jnp.float32)
    if N > n:
        T = jnp.concatenate(
            [T, jnp.tile(jnp.eye(4, dtype=jnp.float32), (N - n, 1, 1))], 0)
    v_valid = jnp.arange(N) < n
    fixed = np.asarray(~np.asarray(v_valid))
    fixed[fixed_idx] = True
    Ec = Ec or (1 << max(4, (max(len(chain), 1) - 1).bit_length()))
    return np.asarray(PG.optimize_pose_graph(
        T, v_valid, jnp.asarray(fixed),
        *_pack(chain, Ec), *_pack(loops, El), n_iters=n_iters))


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

        chain = [(i, i + 1, np.linalg.inv(gt[i]) @ gt[i + 1] @ drift,
                  np.eye(6)) for i in range(n - 1)]
        # loop edge from the FIXED vertex 0 to the free end (one-fixed path)
        loops = [(0, n - 1, np.linalg.inv(gt[0]) @ gt[n - 1],
                  np.eye(6) * 100.0)]
        T_opt = _run_pg(odo, chain, loops, fixed_idx=0, n_iters=30)

        err_before = np.linalg.norm(odo[n - 1][:3, 3] - gt[n - 1][:3, 3])
        err_after = np.linalg.norm(T_opt[n - 1][:3, 3] - gt[n - 1][:3, 3])
        assert err_after < 0.35 * err_before, (err_before, err_after)

    def test_loop_between_free_vertices(self):
        """Both-free loop edge (the Woodbury path): newest vertex fixed,
        loop edge between two interior frames corrects the drift there."""
        n = 20
        gt = [np.eye(4)]
        step = np.asarray(lie.se3_exp(jnp.asarray(
            [1.0, 0, 0, 0, np.pi / 9, 0], jnp.float32)))
        for i in range(1, n):
            gt.append(gt[-1] @ step)
        drift = np.asarray(lie.se3_exp(jnp.asarray(
            [0.03, 0.01, -0.02, 0.003, 0.005, 0.0], jnp.float32)))
        odo = [np.eye(4)]
        for i in range(1, n):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            odo.append(odo[-1] @ rel @ drift)

        chain = [(i, i + 1, np.linalg.inv(gt[i]) @ gt[i + 1] @ drift,
                  np.eye(6)) for i in range(n - 1)]
        loops = [(1, n - 2, np.linalg.inv(gt[1]) @ gt[n - 2],
                  np.eye(6) * 100.0)]
        T_opt = _run_pg(odo, chain, loops, fixed_idx=n - 1, n_iters=30,
                        N=32)
        # the loop-edge residual must be (mostly) closed
        rel_opt = np.linalg.inv(T_opt[1]) @ T_opt[n - 2]
        rel_gt = np.linalg.inv(gt[1]) @ gt[n - 2]
        e = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_gt) @ rel_opt, jnp.float32)))
        rel_odo = np.linalg.inv(odo[1]) @ odo[n - 2]
        e0 = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_gt) @ rel_odo, jnp.float32)))
        assert np.linalg.norm(e) < 0.35 * np.linalg.norm(e0), (e0, e)

    def test_chain_without_loops_is_stable(self):
        """Odometry-only graph with last vertex fixed: poses barely move."""
        n = 8
        T = [np.eye(4)]
        step = np.asarray(lie.se3_exp(jnp.asarray(
            [0.5, 0.1, 0.2, 0.02, 0.05, 0.01], jnp.float32)))
        for i in range(1, n):
            T.append(T[-1] @ step)
        chain = [(i, i + 1, step, np.eye(6)) for i in range(n - 1)]
        T_opt = _run_pg(T, chain, [], fixed_idx=n - 1, n_iters=10)
        np.testing.assert_allclose(T_opt[:n], np.stack(T), atol=2e-3)

    def test_large_graph_scales(self):
        """Malaga/RobotCar stand-in: 1000 keyframes, a handful of loop
        edges — the block-tridiagonal + Woodbury solver must stay fast
        (no dense (6N)^2 factorization) and still close the loops."""
        import time
        n = 1000
        rng = np.random.RandomState(0)
        gt = [np.eye(4)]
        for i in range(1, n):
            xi = np.array([1.0, 0, 0, 0, 2 * np.pi / 360, 0]) \
                + rng.randn(6) * 0.01
            gt.append(gt[-1] @ np.asarray(lie.se3_exp(
                jnp.asarray(xi, jnp.float32))))
        drift = np.asarray(lie.se3_exp(jnp.asarray(
            [0.01, 0.004, -0.006, 0.0008, 0.0012, 0.0], jnp.float32)))
        odo = [np.eye(4)]
        for i in range(1, n):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            odo.append(odo[-1] @ rel @ drift)

        chain = [(i, i + 1, np.linalg.inv(gt[i]) @ gt[i + 1] @ drift,
                  np.eye(6)) for i in range(n - 1)]
        loops = [(a, b, np.linalg.inv(gt[a]) @ gt[b], np.eye(6) * 100.0)
                 for a, b in [(5, 360), (200, 560), (400, 760), (30, 930)]]
        t0 = time.time()
        T_opt = _run_pg(odo, chain, loops, fixed_idx=n - 1, n_iters=25,
                        N=1024, Ec=1024, El=16)
        t_first = time.time() - t0
        t0 = time.time()
        T_opt = _run_pg(odo, chain, loops, fixed_idx=n - 1, n_iters=25,
                        N=1024, Ec=1024, El=16)
        t_warm = time.time() - t0
        print(f"pose-graph 1000 KF: first {t_first:.2f}s warm {t_warm:.2f}s")
        assert t_warm < 10.0, t_warm   # dense 6000^2 x25 would be minutes

        for a, b in [(5, 360), (200, 560), (400, 760)]:
            rel_opt = np.linalg.inv(T_opt[a]) @ T_opt[b]
            rel_gt = np.linalg.inv(gt[a]) @ gt[b]
            e = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(rel_gt) @ rel_opt, jnp.float32))))
            rel_odo = np.linalg.inv(odo[a]) @ odo[b]
            e0 = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(rel_gt) @ rel_odo, jnp.float32))))
            assert e < 0.5 * e0, (a, b, e0, e)
