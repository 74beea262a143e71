"""Closed-form global refinement: SLERP, LUM, SLERP+LUM (SURVEY P8-P10).

Replaces the three circuit-refinement methods of
``3_Global_Optimizations_in_NCLT_dataset.py``:

  * ``Ajustamento_Quaternios_SLERP`` (3_...py:154-185): accumulate relative
    quaternions forward and backward around the closed circuit and slerp the
    two estimates of each node's absolute rotation at t = i/n.
  * ``reconstruir_Ts_para_origem_LUM`` (3_...py:191-219): Lu & Milios linear
    least squares on rotated relative translations.  The reference inverts a
    dense 3(n-1) x 3(n-1) normal matrix; A^T A is tridiag(-1, 2, -1) (x) I_3,
    so we solve it with a Thomas-algorithm scan in O(n) — identical solution,
    no dense inverse.
  * ``reconstruir_Ts_para_origem_SLERP_LUM`` (3_...py:258-284): the repo's
    contribution — SLERP-adjusted rotations feed the LUM observation vector.

Quaternion chain products use ``jax.lax.associative_scan`` (quaternion
multiplication is associative) for O(log n) depth on device; translations use
the host f64 path when given numpy inputs (chains of ~900 links drift in f32,
see utils/se3.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import quaternion as quat
from ...utils import se3


# ---------------------------------------------------------------------------
# SLERP circuit adjustment
# ---------------------------------------------------------------------------

def slerp_adjust_quaternions(q_rel) -> jnp.ndarray:
    """(n, 4) relative circuit quaternions -> (n, 4) adjusted absolute ones.

    Forward accumulation a_i = q_{i-1} * ... * q_0 (i = 1..n-1) and backward
    c_i = (q_{n-1} * ... * q_i)^(-1); node i's absolute rotation is
    slerp(a_i, c_i, t = i/n), with the identity at node 0 — exactly the
    reference's scheme (3_...py:162-184).

    Numpy inputs take a sequential float64 host path: ~900-link f32
    quaternion chains drift the same way the f32 rotation-matrix chain does
    (see se3._rev_matmul_scan); fixture-grade circuits need f64.
    """
    n = q_rel.shape[0]
    if isinstance(q_rel, np.ndarray):
        q64 = np.asarray(q_rel, np.float64)
        fwd = np.empty_like(q64)
        acc = q64[0]
        fwd[0] = acc
        for i in range(1, n):
            acc = np.asarray(quat.qnormalize(quat.qmul(q64[i], acc)))
            fwd[i] = acc
        a = fwd[:-1]
        q_closure = fwd[-1]
        c = np.asarray(quat.qmul(a, quat.qinv(q_closure)[None, :]))
        t = np.arange(1, n, dtype=np.float64) / n
        adjusted = np.asarray(quat.slerp(a, c, t))
        identity = np.array([[1.0, 0.0, 0.0, 0.0]], np.float64)
        return np.concatenate([identity, adjusted], axis=0)
    # forward[i] = q_i * q_{i-1} * ... * q_0  (associative scan, flipped order)
    fwd = jax.lax.associative_scan(lambda a, b: quat.qmul(b, a), q_rel, axis=0)
    a = fwd[:-1]  # a_{i+1} for i = 0..n-2  -> nodes 1..n-1
    q_closure = fwd[-1]
    # backward: c_i = a_i * closure^{-1} (the ALL_FUNCTIONS.py:554 trick, which
    # equals (q_{n-1} ... q_i)^{-1} composed with the full chain)
    c = quat.qmul(a, quat.qinv(q_closure)[None, :])
    t = (jnp.arange(1, n, dtype=q_rel.dtype) / n)[:, None]
    adjusted = quat.slerp(a, c, t[..., 0])
    identity = quat.qidentity(q_rel.dtype)[None]
    return jnp.concatenate([identity, adjusted], axis=0)


def _rel_quaternions(T_rel):
    """Relative rotations -> quaternions; f64 on host, f32 on device."""
    if isinstance(T_rel, np.ndarray):
        return quat.from_rotation_matrix(np.asarray(se3.rot(T_rel), np.float64))
    return quat.from_rotation_matrix(jnp.asarray(se3.rot(T_rel), jnp.float32))


def refine_slerp(T_rel: np.ndarray) -> np.ndarray:
    """``reconstruir_Ts_para_origem_SLERP`` (3_...py:225-250): adjust rotations
    by circuit SLERP, then chain translations with the adjusted rotations.

    Returns (n, 4, 4) absolute poses, node 0 = identity.
    """
    xp = np if isinstance(T_rel, np.ndarray) else jnp
    n = T_rel.shape[0]
    q_adj = slerp_adjust_quaternions(_rel_quaternions(T_rel))
    R_adj = quat.as_rotation_matrix(q_adj)
    ts = se3.trans(T_rel)
    # Reference loop (3_...py:241-249): pose[i] stores the translation
    # accumulated *before* step i; step i adds R_adj[i] @ t_i.
    rotated = xp.einsum("nij,nj->ni", R_adj, ts)             # R_adj[0] = I
    t_cum = xp.cumsum(rotated, axis=0)
    t_nodes = xp.concatenate([xp.zeros((1, 3), dtype=t_cum.dtype), t_cum[: n - 1]], axis=0)
    return se3.make_pose(R_adj, t_nodes)


# ---------------------------------------------------------------------------
# LUM translation adjustment
# ---------------------------------------------------------------------------

def _thomas_block_tridiag(diag: np.ndarray, rhs: np.ndarray, weights=None):
    """Solve (A^T P A) X = rhs where A is the circuit incidence operator.

    A^T P A is tridiagonal with diag_j = (w_j + w_{j+1}) and off-diag
    -w_{j+1}, all scalar multiples of I_3, so the 3 coordinates decouple.
    diag: (m,) main-diagonal scalars; rhs: (m, 3).  O(m) scan.
    """
    xp = np if isinstance(rhs, np.ndarray) else jnp
    m = rhs.shape[0]
    if weights is None:
        off = -xp.ones((m - 1,), dtype=rhs.dtype)
    else:
        off = -weights[1:m]
    if xp is np:
        c = np.zeros(m - 1)
        d = np.zeros((m, 3))
        c_prev, d_prev = 0.0, np.zeros(3)
        cs, ds = [], []
        for j in range(m):
            denom = diag[j] - (off[j - 1] * c_prev if j > 0 else 0.0)
            cj = off[j] / denom if j < m - 1 else 0.0
            dj = (rhs[j] - (off[j - 1] * d_prev if j > 0 else 0.0)) / denom
            cs.append(cj); ds.append(dj)
            c_prev, d_prev = cj, dj
        X = np.zeros((m, 3))
        X[m - 1] = ds[m - 1]
        for j in range(m - 2, -1, -1):
            X[j] = ds[j] - cs[j] * X[j + 1]
        return X
    # JAX path: two scans
    off_full = jnp.concatenate([off, jnp.zeros((1,), rhs.dtype)])
    off_prev = jnp.concatenate([jnp.zeros((1,), rhs.dtype), off])

    def fwd(carry, inp):
        c_prev, d_prev = carry
        dg, oj, op_, r = inp
        denom = dg - op_ * c_prev
        cj = oj / denom
        dj = (r - op_ * d_prev) / denom
        return (cj, dj), (cj, dj)

    (_, _), (cs, ds) = jax.lax.scan(
        fwd, (jnp.zeros((), rhs.dtype), jnp.zeros((3,), rhs.dtype)),
        (diag, off_full, off_prev, rhs),
    )

    def bwd(carry, inp):
        x_next = carry
        cj, dj = inp
        x = dj - cj * x_next
        return x, x

    _, X_rev = jax.lax.scan(bwd, jnp.zeros((3,), rhs.dtype), (cs[::-1], ds[::-1]))
    return X_rev[::-1]


def _lum_solve(T_rel, R_abs, weights=None):
    """Shared LUM core: observations Lb_i = R_abs[i] @ t_i, normal-equation
    tridiagonal solve.  R_abs[0] must be the identity."""
    xp = np if isinstance(T_rel, np.ndarray) else jnp
    n = T_rel.shape[0]
    ts = se3.trans(T_rel)
    Lb = xp.einsum("nij,nj->ni", R_abs[:n], ts)             # (n, 3)
    if weights is None:
        rhs = Lb[: n - 1] - Lb[1:]                           # A^T Lb
        diag = 2.0 * xp.ones((n - 1,), dtype=Lb.dtype)
        X = _thomas_block_tridiag(diag, rhs)
    else:
        w = xp.asarray(weights, dtype=Lb.dtype)
        rhs = w[: n - 1, None] * Lb[: n - 1] - w[1:, None] * Lb[1:]
        diag = w[: n - 1] + w[1:]
        X = _thomas_block_tridiag(diag, rhs, weights=w)
    return X  # (n-1, 3) adjusted absolute translations for nodes 1..n-1


def lum_posterior_variance(T_rel, X, R_abs, weights=None):
    """A-posteriori variance factor sigma0^2 = V^T P V / 3 of the LUM solve
    (the reference prints it: ``ALL_FUNCTIONS.py:620,658``; 3 = redundancy of
    the circuit).  V is computed from the tridiagonal structure without
    materializing A: V_0 = Lb_0 - X_0, V_i = Lb_i - (X_i - X_{i-1}),
    V_{n-1} = Lb_{n-1} + X_{n-2}."""
    xp = np if isinstance(T_rel, np.ndarray) else jnp
    n = T_rel.shape[0]
    Lb = xp.einsum("nij,nj->ni", R_abs[:n], se3.trans(T_rel))
    Xp = xp.concatenate([xp.zeros((1, 3), dtype=Lb.dtype), xp.asarray(X, Lb.dtype),
                         xp.zeros((1, 3), dtype=Lb.dtype)], axis=0)  # X_{-1}=X_{n-1}=0
    V = Lb - (Xp[1:] - Xp[:-1])
    w = xp.ones((n,), Lb.dtype) if weights is None else xp.asarray(weights, Lb.dtype)
    return float(xp.sum(w * xp.sum(V * V, axis=1)) / 3.0)


def refine_lum(T_rel: np.ndarray, weights=None, return_sigma0: bool = False):
    """``reconstruir_Ts_para_origem_LUM`` (3_...py:191-219; weighted variant
    ALL_FUNCTIONS.py:597-629).  Rotations: plain forward chain; translations:
    LUM least squares.  Returns (n, 4, 4) absolute poses; with
    ``return_sigma0`` also the a-posteriori variance factor the reference
    prints."""
    R_abs = se3.chain_rotations_ref(se3.rot(T_rel))          # R_abs[0] = I
    X = _lum_solve(T_rel, R_abs, weights)
    xp = np if isinstance(T_rel, np.ndarray) else jnp
    t_nodes = xp.concatenate([xp.zeros((1, 3), dtype=X.dtype), X], axis=0)
    return se3.make_pose(R_abs, t_nodes)


def refine_slerp_lum(T_rel: np.ndarray, weights=None) -> np.ndarray:
    """``reconstruir_Ts_para_origem_SLERP_LUM`` (3_...py:258-284): SLERP-
    adjusted rotations rotate the LUM observations.  Returns (n, 4, 4)."""
    xp = np if isinstance(T_rel, np.ndarray) else jnp
    q_adj = slerp_adjust_quaternions(_rel_quaternions(T_rel))
    R_adj = quat.as_rotation_matrix(q_adj)
    X = _lum_solve(T_rel, R_adj, weights)
    t_nodes = xp.concatenate([xp.zeros((1, 3), dtype=X.dtype), X], axis=0)
    return se3.make_pose(R_adj, t_nodes)
