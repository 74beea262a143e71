"""Generalized-ICP engine (SURVEY N7) — correspondence search + robust
Mahalanobis Gauss-Newton on se(3) inside a ``lax.while_loop``.

Replaces ``o3d.pipelines.registration.registration_generalized_icp``
(call site ``2_MGICP_refinement...py:155-162``) and ``registration_icp`` with
``TransformationEstimationForGeneralizedICP`` (``ALL_FUNCTIONS.py:220-226``):

  per ICP iteration:
    1. 1-NN correspondences of transformed source in target within max_dist
       (the matmul-tiled ``ops.knn.nn1`` kernel — MXU path)
    2. GICP plane-to-plane residuals  d = q - T p  with mahalanobis metric
       M = (C_q + R C_p R^T)^-1, covariances eigenvalue-clamped to (1, 1, eps)
       with eps = 1e-3 (Open3D's GeneralizedICP regularization)
    3. robust weight from the euclidean residual norm:
       L2 w=1 | L1 w=1/|r| (2_...py:138) | Geman-McClure w=k/(k+r^2)^2
       (GMLoss(k=1.0), ALL_FUNCTIONS.py:219)
    4. one Gauss-Newton step on xi=(omega, t):  T <- exp(xi) T
    5. convergence when |delta fitness| < rel_fitness and |delta rmse| <
       rel_rmse (ICPConvergenceCriteria semantics, 2_...py:160-162)

Everything is fixed-shape and vmappable over scan pairs; the batch dimension
is added by the pipeline layer, not here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import band_nn, eigen3, grid_nn
from ..ops import knn as knn_ops
from ..utils import se3
from ..utils.cloud import Cloud

GICP_EPSILON = 1e-3


class RegistrationResult(NamedTuple):
    """Mirror of Open3D's RegistrationResult scalar surface."""

    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray         # inlier fraction of valid source points
    inlier_rmse: jnp.ndarray     # euclidean rmse over inliers
    num_correspondences: jnp.ndarray
    iterations: jnp.ndarray


# ---------------------------------------------------------------------------
# Covariances
# ---------------------------------------------------------------------------

def regularize_covariances(cov: jnp.ndarray, epsilon: float = GICP_EPSILON) -> jnp.ndarray:
    """GICP covariance conditioning: replace eigenvalues by (eps, 1, 1).

    (smallest eigendirection = surface normal gets eps).
    """
    _, V = eigen3.eigh3(cov)
    d = jnp.asarray([epsilon, 1.0, 1.0], dtype=cov.dtype)
    return jnp.einsum("...ik,k,...jk->...ij", V, d, V)


def covariances_from_normals(normals: jnp.ndarray, epsilon: float = GICP_EPSILON) -> jnp.ndarray:
    """Plane-disk covariance from a unit normal: C = I - (1-eps) n n^T
    (eigenvalues (eps, 1, 1) with n as the eps-direction), the construction
    Open3D uses when a cloud has normals but no covariances."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=normals.dtype), normals.shape[:-1] + (3, 3))
    nnT = normals[..., :, None] * normals[..., None, :]
    return eye - (1.0 - epsilon) * nnT


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate/determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def robust_weight(loss: str, r: jnp.ndarray, k: float) -> jnp.ndarray:
    """Robust-kernel weight as a function of the euclidean residual norm."""
    if loss == "l2":
        return jnp.ones_like(r)
    if loss == "l1":
        return 1.0 / jnp.maximum(r, 1e-8)
    if loss == "gm":  # Geman-McClure, Open3D GMLoss(k)
        return k / jnp.square(k + r * r)
    raise ValueError(f"unknown loss {loss!r}")


# ---------------------------------------------------------------------------
# Single GN iteration
# ---------------------------------------------------------------------------

def _correspond(src_pts, src_mask, tgt_pts, tgt_mask, T, max_dist, accel=None):
    """Correspondence search at pose T.  ``accel`` selects the backend:
    None -> brute nn1; ('grid', HashGrid) -> hash grid (CPU-friendly);
    ('band', BandIndex) -> sorted band sweep (TPU-friendly, no per-iteration
    sorts — the index's query grouping was built at the initial pose and only
    band bounds use current coordinates)."""
    p = se3.transform_points(T, src_pts)
    if accel is None:
        d2, j = knn_ops.nn1(p, tgt_pts, tgt_mask)
    elif isinstance(accel, grid_nn.HashGrid):
        d2, j = grid_nn.nn1_grid(accel, p, max_dist)
    elif isinstance(accel, band_nn.BandIndex):
        d2, j = band_nn.nn1_band_query(accel, p, src_mask, max_dist)
    else:
        raise TypeError(type(accel))
    valid = src_mask & (d2 <= max_dist * max_dist) & (d2 < knn_ops.BIG)
    return p, j, valid, d2


def _metrics(valid, d2, src_mask):
    n_corr = jnp.sum(valid.astype(jnp.float32))
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    fitness = n_corr / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.maximum(n_corr, 1.0))
    return fitness, rmse, n_corr


@functools.partial(jax.jit, static_argnames=("loss",))
def gicp_step(
    src_pts, src_cov, src_mask, tgt_pts, tgt_cov, tgt_mask, T, max_dist,
    loss: str = "l1", gm_k: float = 1.0, accel=None,
):
    """One correspondence + Gauss-Newton update. Returns (T_new, fitness,
    rmse, n_corr) where fitness/rmse are measured at the *input* pose."""
    p, j, valid, d2 = _correspond(src_pts, src_mask, tgt_pts, tgt_mask, T, max_dist, accel)
    fitness, rmse, n_corr = _metrics(valid, d2, src_mask)

    q = tgt_pts[j]
    d = q - p                                                    # (N, 3)
    R = se3.rot(T)
    C_s = jnp.einsum("ij,njk,lk->nil", R, src_cov, R)            # R C R^T
    M = _inv3(tgt_cov[j] + C_s)                                  # (N, 3, 3)

    r_norm = jnp.sqrt(jnp.maximum(d2, 1e-16))
    w = robust_weight(loss, r_norm, gm_k) * valid.astype(jnp.float32)

    # G = [ skew(p) | -I ]  (3x6), d' = G xi approximates -delta d
    G = jnp.concatenate(
        [se3.skew(p), jnp.broadcast_to(-jnp.eye(3, dtype=p.dtype), p.shape + (3,))], axis=-1
    )                                                            # (N, 3, 6)
    MG = jnp.einsum("nij,njk->nik", M, G)                        # (N, 3, 6)
    H = jnp.einsum("nij,nik,n->jk", G, MG, w)                    # (6, 6)
    g = jnp.einsum("nij,nik,nk,n->j", G, M, d, w)                # (6,)

    # Levenberg damping for rank-deficient cases (few/ill-placed points)
    lam = 1e-6 * (jnp.trace(H) / 6.0 + 1.0)
    H = H + lam * jnp.eye(6, dtype=H.dtype)
    xi = -jnp.linalg.solve(H, g)
    # Guard: if no valid correspondences, keep the pose
    xi = jnp.where(n_corr > 0, xi, 0.0)
    T_new = se3.compose(se3.se3_exp(xi), T)
    return T_new, fitness, rmse, n_corr


# ---------------------------------------------------------------------------
# Full ICP loop
# ---------------------------------------------------------------------------

def registration_gicp(source, target, max_corr_dist, T_init, corr_method="auto", **kw):
    """GICP wrapper resolving the correspondence backend at trace time:
    'band' (TPU default), 'grid' (CPU default), or 'brute'."""
    if corr_method == "auto":
        corr_method = "band" if jax.default_backend() == "tpu" else "grid"
    return _registration_gicp(source, target, max_corr_dist, T_init,
                              corr_method=corr_method, **kw)


@functools.partial(
    jax.jit, static_argnames=("loss", "max_iteration", "corr_method")
)
def _registration_gicp(
    source: Cloud,
    target: Cloud,
    max_corr_dist,
    T_init,
    loss: str = "l1",
    gm_k: float = 1.0,
    max_iteration: int = 100,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    corr_method: str = "grid",
) -> RegistrationResult:
    """GICP with ICPConvergenceCriteria semantics (2_...py:160-162).

    ``source``/``target`` must carry covariances (from
    ``ops.normals.with_normals_knn`` or ``covariances_from_normals``); they are
    eigenvalue-clamped here.

    The correspondence accelerator (hash grid or band index) is built once
    and reused across all iterations.
    """
    src_cov = regularize_covariances(source.covariances)
    tgt_cov = regularize_covariances(target.covariances)
    max_dist = jnp.float32(max_corr_dist)
    T0 = jnp.asarray(T_init, jnp.float32)
    if corr_method == "grid":
        accel = grid_nn.build_grid(target.points, target.mask, max_dist)
    elif corr_method == "band":
        p0 = se3.transform_points(T0, source.points)
        accel = band_nn.build_band_index(
            p0, source.mask, target.points, target.mask)
    elif corr_method == "brute":
        accel = None
    else:
        raise ValueError(f"unknown corr_method {corr_method!r}")

    def cond(state):
        _, _, _, _, it, done = state
        return (it < max_iteration) & ~done

    def body(state):
        T, fit_prev, rmse_prev, _, it, _ = state
        T_new, fit, rmse, n_corr = gicp_step(
            source.points, src_cov, source.mask,
            target.points, tgt_cov, target.mask,
            T, max_dist, loss=loss, gm_k=gm_k, accel=accel,
        )
        # Open3D convergence: absolute deltas of fitness and rmse below eps
        done = (jnp.abs(fit - fit_prev) < relative_fitness) & (
            jnp.abs(rmse - rmse_prev) < relative_rmse
        )
        done = done | (n_corr == 0)
        return (T_new, fit, rmse, n_corr, it + 1, done)

    init = (T0, jnp.float32(-1.0), jnp.float32(-1.0), jnp.float32(0.0), 0, False)
    T, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init)

    # Final metrics at the converged pose
    _, _, valid, d2 = _correspond(
        source.points, source.mask, target.points, target.mask, T, max_dist, accel
    )
    fitness, rmse, n_corr = _metrics(valid, d2, source.mask)
    return RegistrationResult(T, fitness, rmse, n_corr, iters)
