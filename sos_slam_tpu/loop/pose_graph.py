"""SE(3) pose-graph optimization in JAX (replaces the vendored g2o).

The reference (LoopHandler::optimize, src/LoopClosure/LoopHandler.cpp:99-140)
builds a g2o graph with one SE3 vertex per marginalized keyframe, odometry
edges weighted by dso_error/scale_error, loop edges from verified candidates,
a Huber kernel, the newest vertex fixed, and runs 25 LM iterations.

Here: vertices are a padded (N,4,4) array, edges padded (E,...) arrays; each
LM iteration batch-computes all edge residuals/Jacobians, scatter-adds the
6N x 6N normal equations, and solves dense (Jacobi-preconditioned). N grows
unbounded in SLAM; arrays are padded to the next power of two so XLA
recompiles only O(log N) times over a run.

Edge convention (matching the reference's EdgeSE3 usage): an edge (a, b,
T_meas) with T_meas ~= T_wa^-1 T_wb has residual
r = log(T_meas^-1 (T_wa^-1 T_wb)), with Jacobians approximated at identity
increments (standard pose-graph Gauss-Newton; the reference's g2o does the
same linearization).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sos_slam_tpu.utils import lie

HUBER_DELTA = 1.0


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(
    T_wc: jnp.ndarray,        # (N,4,4) vertex estimates (padded)
    v_valid: jnp.ndarray,     # (N,) bool
    fixed: jnp.ndarray,       # (N,) bool — fixed vertices (newest + invalid)
    e_from: jnp.ndarray,      # (E,) int32
    e_to: jnp.ndarray,        # (E,) int32
    e_meas: jnp.ndarray,      # (E,4,4)  T_from^-1 T_to measurement
    e_info: jnp.ndarray,      # (E,6,6)
    e_valid: jnp.ndarray,     # (E,) bool
    n_iters: int = 25,
    lam0: float = 1e-4,
) -> jnp.ndarray:
    """Returns optimized (N,4,4). Updates are right-multiplied local eps:
    T <- T exp(eps)."""
    N = T_wc.shape[0]

    def residuals(T):
        Ta = T[e_from]
        Tb = T[e_to]
        rel = lie.se3_inv(Ta) @ Tb
        r = lie.se3_log(lie.se3_inv(e_meas) @ rel)        # (E,6)
        return r

    def build_system(T, lam):
        r = residuals(T)
        # Huber weights on the information-whitened norm
        rn = jnp.sqrt(jnp.einsum("ei,eij,ej->e", r, e_info, r) + 1e-12)
        w_huber = jnp.where(rn < HUBER_DELTA, 1.0, HUBER_DELTA / rn)
        W = e_info * (w_huber * e_valid)[:, None, None]

        # Jacobians wrt right-eps on each vertex:
        # d r / d eps_b = Jr^-1(r) Adj(rel^-1 meas)... standard approximation:
        # r ~ log(M^-1 Ta^-1 Tb exp(eps_b)) => dr/d eps_b ~= I (small r)
        # r with Ta exp(eps_a): dr/d eps_a ~= -Adj(Tb^-1 Ta)
        rel_ba = lie.se3_inv(T[e_to]) @ T[e_from]
        Ja = -lie.se3_adj(rel_ba)                 # (E,6,6)
        Jb = jnp.broadcast_to(jnp.eye(6), Ja.shape)

        # normal equations
        H = jnp.zeros((N, 6, N, 6))
        b = jnp.zeros((N, 6))
        JaW = jnp.einsum("eij,eik->ejk", Ja, W)   # Ja^T W
        JbW = jnp.einsum("eij,eik->ejk", Jb, W)
        Haa = jnp.einsum("ejk,ekl->ejl", JaW, Ja)
        Hbb = jnp.einsum("ejk,ekl->ejl", JbW, Jb)
        Hab = jnp.einsum("ejk,ekl->ejl", JaW, Jb)
        ba_ = jnp.einsum("ejk,ek->ej", JaW, r)
        bb_ = jnp.einsum("ejk,ek->ej", JbW, r)

        H = H.at[e_from, :, e_from, :].add(Haa)
        H = H.at[e_to, :, e_to, :].add(Hbb)
        H = H.at[e_from, :, e_to, :].add(Hab)
        H = H.at[e_to, :, e_from, :].add(jnp.swapaxes(Hab, -1, -2))
        b = b.at[e_from].add(ba_)
        b = b.at[e_to].add(bb_)

        Hm = H.reshape(6 * N, 6 * N)
        bm = b.reshape(6 * N)
        free = (v_valid & ~fixed)
        m = jnp.repeat(free.astype(jnp.float32), 6)
        Hm = Hm * m[:, None] * m[None, :]
        Hm = Hm + jnp.diag(1.0 - m)
        Hm = Hm + lam * jnp.diag(jnp.maximum(jnp.diagonal(Hm), 1e-6))
        bm = bm * m
        return Hm, bm, r, w_huber

    def energy(T):
        r = residuals(T)
        rn2 = jnp.einsum("ei,eij,ej->e", r, e_info, r)
        hub = jnp.where(jnp.sqrt(rn2 + 1e-12) < HUBER_DELTA, rn2,
                        2 * HUBER_DELTA * jnp.sqrt(rn2 + 1e-12) - HUBER_DELTA ** 2)
        return jnp.sum(jnp.where(e_valid, hub, 0.0))

    def body(it, carry):
        T, lam = carry
        Hm, bm, _, _ = build_system(T, lam)
        svec = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(Hm)) + 1e-6)
        x = svec * jnp.linalg.solve(Hm * svec[:, None] * svec[None, :],
                                    svec * bm)
        eps = (-x).reshape(N, 6)
        eps = jnp.where(jnp.isfinite(eps), eps, 0.0)
        T_new = T @ lie.se3_exp(eps)
        accept = energy(T_new) < energy(T)
        T2 = jnp.where(accept, T_new, T)
        lam2 = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (T2, jnp.clip(lam2, 1e-6, 1e4))

    T_out, _ = jax.lax.fori_loop(0, n_iters, body, (T_wc, jnp.float32(lam0)))
    return T_out


def edge_information(pose_error: float, scale_error: float,
                     rot_weight: float = 1e4) -> jnp.ndarray:
    """LoopEdge information matrix (LoopHandler.h:57-71): identity / pose
    error; translation block additionally / scale_error; rotation x 1e4."""
    info = jnp.eye(6) / max(pose_error, 1e-9)
    t_fac = (1.0 / scale_error) if scale_error > 0 else 1e-9
    info = info.at[:3, :3].mul(t_fac)
    info = info.at[3:, 3:].mul(rot_weight)
    return info
