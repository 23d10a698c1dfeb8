"""Unit tests for SO3/SE3/Sim3 Lie groups (sos_slam_tpu/utils/lie.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.utils import lie

# fast, pure-host subset: run with pytest -m smoke (seconds, no big jits)
pytestmark = pytest.mark.smoke


KEY = jax.random.PRNGKey(0)


def rand_w(key, n=32, scale=1.0):
    return jax.random.normal(key, (n, 3)) * scale


def rand_w_in_pi(key, n=32, max_theta=3.0):
    """Random rotation vectors with theta < pi (log's canonical branch)."""
    w = jax.random.normal(key, (n, 3))
    theta = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1)) * max_theta
    return w / jnp.linalg.norm(w, axis=-1, keepdims=True) * theta


class TestSO3:
    def test_exp_orthogonal(self):
        R = lie.so3_exp(rand_w(KEY))
        I = jnp.eye(3)
        err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - I))
        assert err < 1e-5
        assert jnp.max(jnp.abs(jnp.linalg.det(R) - 1.0)) < 1e-5

    def test_exp_log_roundtrip(self):
        w = rand_w_in_pi(KEY)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=2e-5)

    def test_small_angle(self):
        w = rand_w(KEY, scale=1e-8)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(R, jnp.eye(3)[None] + lie.so3_hat(w), atol=1e-7)
        np.testing.assert_allclose(lie.so3_log(R), w, atol=1e-7)

    def test_near_pi(self):
        axis = np.array([1.0, 0.0, 0.0])
        w = (np.pi - 1e-4) * axis
        R = lie.so3_exp(jnp.array(w, jnp.float32))
        w2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-2)

    def test_rodrigues_vs_scipy_style(self):
        # against the classic closed form for a known rotation: 90 deg about z
        w = jnp.array([0.0, 0.0, np.pi / 2])
        R = lie.so3_exp(w)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        k1, k2 = jax.random.split(KEY)
        xi = jnp.concatenate([rand_w(k1, scale=2.0), rand_w_in_pi(k2)], -1)
        xi2 = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(xi2, xi, atol=5e-5)

    def test_inverse(self):
        xi = jnp.concatenate([rand_w(KEY), rand_w(KEY, scale=0.5)], -1)
        T = lie.se3_exp(xi)
        TI = lie.se3_inv(T) @ T
        np.testing.assert_allclose(TI, jnp.broadcast_to(jnp.eye(4), TI.shape), atol=1e-5)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], jnp.eye(3), atol=1e-6)

    def test_adjoint_identity(self):
        """Adj(T) xi == log(T exp(xi) T^-1) to first order."""
        xi_T = jnp.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.3])
        T = lie.se3_exp(xi_T)
        xi = jnp.array([1e-3, -2e-3, 0.5e-3, 1e-3, -1e-3, 2e-3])
        lhs = lie.se3_adj(T) @ xi
        rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.se3_inv(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_transform_points(self):
        T = lie.se3_exp(jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, np.pi / 2]))
        p = jnp.array([[1.0, 0.0, 0.0]])
        q = lie.transform_points(T, p)
        assert q.shape == (1, 3)


class TestSim3:
    def test_exp_log_roundtrip(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xi = jnp.concatenate(
            [rand_w(k1), rand_w(k2, scale=0.8), jax.random.normal(k3, (32, 1)) * 0.5], -1
        )
        xi2 = lie.sim3_log(lie.sim3_exp(xi))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_scale_extraction(self):
        xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.7])
        T = lie.sim3_exp(xi)
        np.testing.assert_allclose(
            jnp.linalg.det(T[:3, :3]) ** (1 / 3), np.exp(0.7), rtol=1e-5
        )

    def test_inverse(self):
        xi = jnp.array([0.5, -0.2, 0.1, 0.1, 0.3, -0.2, 0.4])
        T = lie.sim3_exp(xi)
        TI = lie.sim3_inv(T) @ T
        np.testing.assert_allclose(TI, jnp.eye(4), atol=1e-5)

    def test_sim3_reduces_to_se3(self):
        """sigma = 0 must reproduce SE(3) exp exactly."""
        xi6 = jnp.array([0.4, -0.1, 0.2, 0.2, -0.3, 0.1])
        xi7 = jnp.concatenate([xi6, jnp.zeros(1)])
        np.testing.assert_allclose(lie.sim3_exp(xi7), lie.se3_exp(xi6), atol=1e-5)


class TestQuat:
    def test_quat_identity(self):
        np.testing.assert_allclose(
            lie.quat_to_rot(jnp.array([1.0, 0.0, 0.0, 0.0])), jnp.eye(3), atol=1e-6
        )

    def test_quat_matches_exp(self):
        w = jnp.array([0.3, -0.4, 0.2])
        theta = float(jnp.linalg.norm(w))
        axis = w / theta
        q = jnp.concatenate(
            [jnp.array([np.cos(theta / 2)]), np.sin(theta / 2) * axis]
        )
        np.testing.assert_allclose(lie.quat_to_rot(q), lie.so3_exp(w), atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda xi: lie.se3_log(lie.se3_exp(xi))))
    xi = jax.random.normal(KEY, (64, 6)) * 0.5
    np.testing.assert_allclose(f(xi), xi, atol=5e-5)


class TestNumpyTwins:
    """Host-side numpy twins must match the jax implementations."""

    def test_np_so3(self):
        for w in ([0.3, -0.2, 0.5], [1e-9, 0, 0], [0, 2.8, 0]):
            np.testing.assert_allclose(
                lie.np_so3_exp(w), lie.so3_exp(jnp.array(w, jnp.float32)),
                atol=1e-5)
            R = lie.np_so3_exp(w)
            np.testing.assert_allclose(lie.np_so3_log(R), w, atol=1e-6)

    def test_np_se3(self):
        xi = np.array([0.4, -0.1, 0.2, 0.2, -0.3, 0.1])
        np.testing.assert_allclose(
            lie.np_se3_exp(xi), lie.se3_exp(jnp.asarray(xi, jnp.float32)),
            atol=1e-5)
        np.testing.assert_allclose(lie.np_se3_log(lie.np_se3_exp(xi)), xi,
                                   atol=1e-9)

    def test_np_quat(self):
        q = np.array([0.9, 0.1, -0.2, 0.15])
        np.testing.assert_allclose(
            lie.np_quat_to_rot(q),
            lie.quat_to_rot(jnp.asarray(q, jnp.float32)), atol=1e-5)
