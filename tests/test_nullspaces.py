"""Gauge null-space computation + orthogonalization (getNullspaces /
EnergyFunctional::orthogonalize parity; reference
FullSystemOptimize.cpp:528-576, HessianBlocks.cpp:66-102,
EnergyFunctional.cpp:971-1027)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_slam_tpu.models import energy as E
from sos_slam_tpu.ops import ba as B
from sos_slam_tpu.utils import lie


def test_frame_nullspaces_identity_pose():
    ns_pose, ns_scale, ns_aff = E.frame_nullspaces(
        jnp.eye(4), jnp.float32(1.0), jnp.float32(0.0))
    # at T = I the left-increment gauge derivative is the identity
    np.testing.assert_allclose(np.asarray(ns_pose), np.eye(6), atol=1e-4)
    # scale gauge moves nothing at the origin (translation = 0)
    np.testing.assert_allclose(np.asarray(ns_scale), np.zeros(6), atol=1e-6)
    # affine null spaces: [1,0] and [0, exp(a0)*exposure] = [0,1]
    np.testing.assert_allclose(np.asarray(ns_aff), np.eye(2), atol=1e-6)


def test_frame_nullspaces_scale_direction():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, -2.0, 0.5]
    _, ns_scale, _ = E.frame_nullspaces(jnp.asarray(T), jnp.float32(1.0),
                                        jnp.float32(0.0))
    ns = np.asarray(ns_scale)
    # pure-translation perturbation: rotation part stays zero, translation
    # part is parallel to t (finite-difference magnitude 1e-2 * |t|)
    np.testing.assert_allclose(ns[3:], 0.0, atol=1e-6)
    d = ns[:3] / np.linalg.norm(ns[:3])
    t = T[:3, 3] / np.linalg.norm(T[:3, 3])
    np.testing.assert_allclose(d, t, atol=1e-4)


def _tiny_ba(F=4, P=8):
    fx = 300.0
    D = 4 + 8 * F
    rng = np.random.default_rng(0)
    T = np.stack([np.eye(4, dtype=np.float32)] * F)
    for k in range(F):
        T[k, :3, 3] = rng.normal(size=3) * 0.1
    return B.BAState(
        frame_valid=jnp.array([True] * 3 + [False] * (F - 3)),
        T_cw_eval=jnp.asarray(T),
        state=jnp.zeros((F, 8)), state_zero=jnp.zeros((F, 8)),
        exposure=jnp.ones(F), energy_th=jnp.full((F,), 1e3),
        prior=jnp.zeros((F, 8)),
        c=jnp.array([fx, fx, 320.0, 240.0]) / B.CALIB_SCALE,
        c_zero=jnp.array([fx, fx, 320.0, 240.0]) / B.CALIB_SCALE,
        pt_valid=jnp.zeros(P, bool), host=jnp.zeros(P, jnp.int32),
        u=jnp.zeros(P), v=jnp.zeros(P), color=jnp.zeros((P, 8)),
        weight=jnp.zeros((P, 8)), idepth=jnp.zeros(P),
        idepth_zero=jnp.zeros(P), pt_prior=jnp.zeros(P),
        res_exist=jnp.zeros((P, F), bool),
        res_state=jnp.zeros((P, F), jnp.int8),
        HM=jnp.zeros((D, D)), bM=jnp.zeros(D),
    )


def test_get_nullspaces_shape_and_masking():
    ba = _tiny_ba()
    ns = np.asarray(E.get_nullspaces(ba))
    D = 4 + 8 * ba.F
    assert ns.shape == (9, D)
    # calib block untouched, invalid frame slots zero
    np.testing.assert_allclose(ns[:, :4], 0.0)
    np.testing.assert_allclose(ns[:, 4 + 8 * 3:], 0.0)
    # pose rows are nonzero for valid frames
    assert np.abs(ns[:6, 4:4 + 24]).max() > 0.1


def test_orthogonalize_removes_nullspace_component():
    ba = _tiny_ba()
    ns = E.get_nullspaces(ba)
    # reference orthogonalizes against pose (6 rows) + scale (row 8)
    nsel = jnp.concatenate([ns[:6], ns[8:9]], axis=0)
    D = nsel.shape[1]
    rng = np.random.default_rng(1)
    H = rng.normal(size=(D, D)).astype(np.float32)
    H = H @ H.T
    b = rng.normal(size=D).astype(np.float32)
    b2, H2 = E.orthogonalize(jnp.asarray(b), jnp.asarray(H), nsel)
    b2, H2 = np.asarray(b2), np.asarray(H2)
    nsn = np.asarray(nsel)
    nsn = nsn / np.linalg.norm(nsn, axis=1, keepdims=True)
    # projected gradient has no component along any null-space direction
    assert np.abs(nsn @ b2).max() < 1e-3 * max(np.linalg.norm(b), 1.0)
    # H2 annihilates the null-space directions from both sides
    assert np.abs(nsn @ H2 @ nsn.T).max() < 1e-2 * np.abs(H).max()
