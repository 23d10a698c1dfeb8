"""SE(3) pose-graph optimization in JAX (replaces the vendored g2o).

The reference (LoopHandler::optimize, src/LoopClosure/LoopHandler.cpp:99-140)
builds a g2o graph with one SE3 vertex per marginalized keyframe, odometry
edges weighted by dso_error/scale_error, loop edges from verified candidates,
a Huber kernel, the newest vertex fixed, and runs 25 LM iterations.

SLAM pose graphs are a CHAIN (consecutive odometry edges) plus a small
number of verified loop edges, so the normal equations are block-tridiagonal
plus a low-rank correction. Each LM iteration solves them exactly in O(N):

    H = A + U C U^T,     A   = chain edges + damping  (block-tridiagonal)
                         U,C = loop-edge Jacobian blocks / information
    H^-1 b = A^-1 b - A^-1 U (C^-1 + U^T A^-1 U)^-1 U^T A^-1 b   (Woodbury)

with A solved by a block-Thomas recursion (`lax.scan` over the 6x6 blocks)
— no dense (6N)^2 matrix is ever materialized, so KITTI/Malaga-scale graphs
(1000+ keyframes) stay cheap. Vertices are padded (N,4,4); edges padded;
XLA recompiles only O(log N) times over a run.

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


def _edge_blocks(T, e_from, e_to, e_meas, e_info, e_valid):
    """Per-edge residual + Gauss-Newton blocks.

    Returns (r, W, Ja): residual (E,6), Huber-weighted information (E,6,6),
    and the from-vertex Jacobian (E,6,6); the to-vertex Jacobian is I."""
    Ta = T[e_from]
    Tb = T[e_to]
    rel = lie.se3_inv(Ta) @ Tb
    r = lie.se3_log(lie.se3_inv(e_meas) @ rel)             # (E,6)
    rn = jnp.sqrt(jnp.einsum("ei,eij,ej->e", r, e_info, r) + 1e-12)
    w_huber = jnp.where(rn < HUBER_DELTA, 1.0, HUBER_DELTA / rn)
    W = e_info * (w_huber * e_valid)[:, None, None]
    Ja = -lie.se3_adj(lie.se3_inv(Tb) @ Ta)                # (E,6,6)
    return r, W, Ja


def _edge_energy(T, e_from, e_to, e_meas, e_info, e_valid):
    Ta = T[e_from]
    Tb = T[e_to]
    rel = lie.se3_inv(Ta) @ Tb
    r = lie.se3_log(lie.se3_inv(e_meas) @ rel)
    rn2 = jnp.einsum("ei,eij,ej->e", r, e_info, r)
    hub = jnp.where(jnp.sqrt(rn2 + 1e-12) < HUBER_DELTA, rn2,
                    2 * HUBER_DELTA * jnp.sqrt(rn2 + 1e-12) - HUBER_DELTA ** 2)
    return jnp.sum(jnp.where(e_valid, hub, 0.0))


def block_tridiag_solve(D: jnp.ndarray, O: jnp.ndarray, B: jnp.ndarray):
    """Solve the block-tridiagonal system with diagonal blocks D (N,6,6),
    super-diagonal blocks O (N,6,6) (O[i] couples i and i+1; O[N-1] must
    be zero), sub-diagonal = O^T, for RHS B (N,6,K). Block-Thomas via two
    lax.scans; O(N) with 6x6 factorizations."""
    N = D.shape[0]

    def fwd(carry, inp):
        C_prev, Y_prev, O_prev = carry
        D_i, O_i, B_i = inp
        # L = O_prev^T C_prev^-1  ->  L^T = C_prev^-T O_prev
        Lt = jnp.linalg.solve(jnp.swapaxes(C_prev, -1, -2), O_prev)
        L = jnp.swapaxes(Lt, -1, -2)
        C_i = D_i - L @ O_prev
        Y_i = B_i - L @ Y_prev
        return (C_i, Y_i, O_i), (C_i, Y_i)

    init = (D[0], B[0], O[0])
    (_, _, _), (C_rest, Y_rest) = jax.lax.scan(
        fwd, init, (D[1:], O[1:], B[1:]))
    C = jnp.concatenate([D[0][None], C_rest], 0)
    Y = jnp.concatenate([B[0][None], Y_rest], 0)

    def bwd(X_next, inp):
        C_i, Y_i, O_i = inp
        X_i = jnp.linalg.solve(C_i, Y_i - O_i @ X_next)
        return X_i, X_i

    X_last = jnp.linalg.solve(C[N - 1], Y[N - 1])
    _, X_rev = jax.lax.scan(bwd, X_last, (C[:-1], Y[:-1], O[:-1]),
                            reverse=True)
    return jnp.concatenate([X_rev, X_last[None]], 0)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(
    T_wc: jnp.ndarray,        # (N,4,4) vertex estimates (padded)
    v_valid: jnp.ndarray,     # (N,) bool
    fixed: jnp.ndarray,       # (N,) bool — fixed vertices (newest + invalid)
    c_from: jnp.ndarray,      # (Ec,) int32 chain (odometry) edges: to = from+1
    c_to: jnp.ndarray,        # (Ec,) int32
    c_meas: jnp.ndarray,      # (Ec,4,4)  T_from^-1 T_to measurement
    c_info: jnp.ndarray,      # (Ec,6,6)
    c_valid: jnp.ndarray,     # (Ec,) bool
    l_from: jnp.ndarray,      # (El,) int32 loop edges (any pair)
    l_to: jnp.ndarray,        # (El,) int32
    l_meas: jnp.ndarray,      # (El,4,4)
    l_info: jnp.ndarray,      # (El,6,6)
    l_valid: jnp.ndarray,     # (El,) bool
    n_iters: int = 25,
    lam0: float = 1e-4,
) -> jnp.ndarray:
    """Returns optimized (N,4,4). Updates are right-multiplied local eps:
    T <- T exp(eps)."""
    N = T_wc.shape[0]
    El = l_from.shape[0]
    free = (v_valid & ~fixed)
    mfree = free.astype(jnp.float32)

    def energy(T):
        return (_edge_energy(T, c_from, c_to, c_meas, c_info, c_valid)
                + _edge_energy(T, l_from, l_to, l_meas, l_info, l_valid))

    def solve_step(T, lam):
        # ---- chain blocks -> block-tridiagonal A ----
        rc, Wc, Jac = _edge_blocks(T, c_from, c_to, c_meas, c_info, c_valid)
        JaW = jnp.einsum("eij,eik->ejk", Jac, Wc)          # Ja^T W
        Haa = jnp.einsum("ejk,ekl->ejl", JaW, Jac)
        Hbb = Wc                                           # Jb = I
        Hab = JaW
        ba_c = jnp.einsum("ejk,ek->ej", JaW, rc)
        bb_c = jnp.einsum("ejk,ek->ej", Wc, rc)

        D = jnp.zeros((N, 6, 6))
        b = jnp.zeros((N, 6))
        D = D.at[c_from].add(Haa)
        D = D.at[c_to].add(Hbb)
        b = b.at[c_from].add(ba_c)
        b = b.at[c_to].add(bb_c)
        # super-diagonal block at min(from, to); odometry edges have
        # to = from + 1 so the block lands at `from` untransposed
        lo = jnp.minimum(c_from, c_to)
        swap = c_from > c_to
        Off = jnp.where(swap[:, None, None], jnp.swapaxes(Hab, -1, -2), Hab)
        O = jnp.zeros((N, 6, 6)).at[lo].add(Off)

        # ---- loop blocks + their gradient ----
        rl, Wl, Jal = _edge_blocks(T, l_from, l_to, l_meas, l_info, l_valid)
        JaWl = jnp.einsum("eij,eik->ejk", Jal, Wl)
        Haa_l = jnp.einsum("ejk,ekl->ejl", JaWl, Jal)
        b = b.at[l_from].add(jnp.einsum("ejk,ek->ej", JaWl, rl))
        b = b.at[l_to].add(jnp.einsum("ejk,ek->ej", Wl, rl))
        # a loop edge with exactly one free end (the common case: a fresh
        # loop edge targets the newest = FIXED vertex) contributes only a
        # diagonal block on the free side — tridiagonal structure intact;
        # only both-free edges need the low-rank (Woodbury) correction
        both_free = l_valid & free[l_from] & free[l_to]
        a_only = l_valid & free[l_from] & ~free[l_to]
        b_only = l_valid & ~free[l_from] & free[l_to]
        D = D.at[l_from].add(Haa_l * a_only[:, None, None])
        D = D.at[l_to].add(Wl * b_only[:, None, None])

        # ---- damping on the FULL diagonal (chain + loop) ----
        dJa = jnp.einsum("eij,eij->ej", Jal,
                         jnp.einsum("eij,ejk->eik", Wl, Jal))
        diag_loop = jnp.zeros((N, 6)).at[l_from].add(
            dJa * both_free[:, None])
        diag_loop = diag_loop.at[l_to].add(
            jax.vmap(jnp.diagonal)(Wl) * both_free[:, None])
        diag_full = jax.vmap(jnp.diagonal)(D) + diag_loop
        damp = lam * jnp.maximum(diag_full, 1e-6) + 1e-8
        D = D + jax.vmap(jnp.diag)(damp)

        # fixed / invalid vertices: identity row, zero couplings, zero rhs
        D = jnp.where(free[:, None, None], D, jnp.eye(6))
        pair_free = (mfree * jnp.roll(mfree, -1))  # both i and i+1 free
        O = O * pair_free[:, None, None]
        O = O.at[N - 1].set(0.0)
        b = b * mfree[:, None]

        # ---- A^-1 b ----
        x0 = block_tridiag_solve(D, O, b[..., None])[..., 0]    # (N,6)

        # ---- Woodbury correction for the both-free loop edges ----
        # U: (N,6, El,6) — column block e has Ja^T at vertex from, I at to
        act = both_free.astype(jnp.float32)
        U = jnp.zeros((N, 6, El, 6))
        U = U.at[l_from, :, jnp.arange(El), :].add(
            jnp.swapaxes(Jal, -1, -2) * act[:, None, None])
        U = U.at[l_to, :, jnp.arange(El), :].add(
            jnp.broadcast_to(jnp.eye(6), (El, 6, 6)) * act[:, None, None])
        Um = U.reshape(N, 6, El * 6)
        Y = block_tridiag_solve(D, O, Um)                        # A^-1 U
        # C = blockdiag(W_e); inactive edges -> identity (zero U anyway)
        Winv = jnp.linalg.inv(
            jnp.where(both_free[:, None, None], Wl, jnp.eye(6)[None]))
        Cinv = _blockdiag(Winv)
        S = Cinv + jnp.einsum("nik,nil->kl", Um, Y)              # (6El,6El)
        S = 0.5 * (S + S.T)
        UtX0 = jnp.einsum("nik,ni->k", Um, x0)
        z = jnp.linalg.solve(S, UtX0)
        x = x0 - jnp.einsum("nik,k->ni", Y, z)
        return x

    def body(it, carry):
        T, lam = carry
        x = solve_step(T, lam)
        eps = -x * mfree[:, None]
        eps = jnp.where(jnp.isfinite(eps), eps, 0.0)
        T_new = T @ lie.se3_exp(eps)
        accept = energy(T_new) < energy(T)
        T2 = jnp.where(accept, T_new, T)
        lam2 = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (T2, jnp.clip(lam2, 1e-6, 1e4))

    T_out, _ = jax.lax.fori_loop(0, n_iters, body, (T_wc, jnp.float32(lam0)))
    return T_out


def _blockdiag(blocks: jnp.ndarray) -> jnp.ndarray:
    """(E,6,6) -> (6E,6E) block-diagonal."""
    E = blocks.shape[0]
    eye = jnp.eye(E)
    return (eye[:, None, :, None] * blocks[:, :, None, :]).reshape(6 * E,
                                                                   6 * E)


def edge_information(pose_error: float, scale_error: float,
                     rot_weight: float = 1e4) -> jnp.ndarray:
    """LoopEdge information matrix (LoopHandler.h:57-71): identity / pose
    error; translation block additionally / scale_error; rotation x 1e4."""
    info = jnp.eye(6) / max(pose_error, 1e-9)
    t_fac = (1.0 / scale_error) if scale_error > 0 else 1e-9
    info = info.at[:3, :3].mul(t_fac)
    info = info.at[3:, 3:].mul(rot_weight)
    return info
