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


def solve6_cholesky(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 6x6 SPD Cholesky solve.  ``jnp.linalg.solve`` lowers to a
    looped LU on TPU (~1 ms for a 6x6 inside the ICP loop, measured); the
    static unroll is pure scalar arithmetic and fuses into the iteration."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for k in range(i + 1):
            s = H[i, k]
            for m in range(k):
                s = s - L[i][m] * L[k][m]
            if i == k:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][k] = s / L[k][k]
    y = [None] * n
    for i in range(n):
        s = g[i]
        for m in range(i):
            s = s - L[i][m] * y[m]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for m in range(i + 1, n):
            s = s - L[m][i] * x[m]
        x[i] = s / L[i][i]
    return jnp.stack(x)


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

def _correspond(src_pts, src_mask, tgt_pts, tgt_mask, T, max_dist, accel=None,
                band_backend="xla"):
    """Correspondence search at pose T.  ``accel`` selects the backend:
    None -> brute nn1; ('grid', HashGrid) -> hash grid (CPU-friendly);
    ('band', BandIndex) -> sorted band sweep (TPU-friendly, no per-iteration
    sorts — the index's query grouping was built at the initial pose and only
    band bounds use current coordinates).  ``band_backend='pallas'`` runs the
    band sweep as the fused VMEM kernel (TPU only)."""
    p = se3.transform_points(T, src_pts)
    if accel is None:
        d2, j = knn_ops.nn1(p, tgt_pts, tgt_mask)
    elif isinstance(accel, grid_nn.HashGrid):
        d2, j = grid_nn.nn1_grid(accel, p, max_dist)
    elif isinstance(accel, band_nn.BandIndex):
        d2, j = band_nn.nn1_band_query(accel, p, src_mask, max_dist,
                                       backend=band_backend)
    else:
        raise TypeError(type(accel))
    valid = src_mask & (d2 <= max_dist * max_dist) & (d2 < knn_ops.BIG)
    return p, j, valid, d2


def _metrics(valid, d2, src_mask, axis_name=None):
    """fitness/rmse/n_corr reductions; with ``axis_name`` set (point-sharded
    source inside shard_map) the raw sums are psummed so every device reports
    the global metrics."""
    n_corr = jnp.sum(valid.astype(jnp.float32))
    n_src = jnp.sum(src_mask.astype(jnp.float32))
    sum_d2 = jnp.sum(jnp.where(valid, d2, 0.0))
    if axis_name is not None:
        n_corr, n_src, sum_d2 = jax.lax.psum((n_corr, n_src, sum_d2), axis_name)
    fitness = n_corr / jnp.maximum(n_src, 1.0)
    rmse = jnp.sqrt(sum_d2 / jnp.maximum(n_corr, 1.0))
    return fitness, rmse, n_corr


@functools.partial(jax.jit, static_argnames=("loss", "band_backend", "axis_name"))
def gicp_step(
    src_pts, src_cov, src_mask, tgt_pts, tgt_cov, tgt_mask, T, max_dist,
    loss: str = "l1", gm_k: float = 1.0, accel=None, band_backend: str = "xla",
    axis_name: str | None = None,
):
    """One correspondence + Gauss-Newton update. Returns (T_new, fitness,
    rmse, n_corr) where fitness/rmse are measured at the *input* pose.

    With ``axis_name`` set the source rows are a shard of a mesh axis
    (parallel.point_sharding): H/g and the metric sums are psum-reduced so
    every device takes the identical global pose update."""
    p, j, valid, d2 = _correspond(src_pts, src_mask, tgt_pts, tgt_mask, T, max_dist,
                                  accel, band_backend)
    fitness, rmse, n_corr = _metrics(valid, d2, src_mask, axis_name)

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
    if axis_name is not None:  # reduce normal equations over the point shards
        H, g = jax.lax.psum((H, g), axis_name)

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
    'band_pallas' (TPU default — fused VMEM band sweep), 'band' (XLA band
    sweep, vmap-safe), 'grid' (CPU default), or 'brute'.  ``axis_name=...``
    (kw) enables the point-sharded mode: source rows are a shard of that mesh
    axis and all reductions psum over it (parallel.point_sharding)."""
    if corr_method == "auto":
        corr_method = "band_pallas" if jax.default_backend() == "tpu" else "grid"
    return _registration_gicp(source, target, max_corr_dist, T_init,
                              corr_method=corr_method, **kw)


@functools.partial(
    jax.jit, static_argnames=("loss", "max_iteration", "corr_method", "axis_name")
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
    axis_name: str | None = None,
) -> RegistrationResult:
    """GICP with ICPConvergenceCriteria semantics (2_...py:160-162).

    ``source``/``target`` must carry covariances (from
    ``ops.normals.with_normals_knn`` or ``covariances_from_normals``); they are
    eigenvalue-clamped here.

    The correspondence accelerator (hash grid or band index) is built once
    and reused across all iterations.
    """
    max_dist = jnp.float32(max_corr_dist)
    T0 = jnp.asarray(T_init, jnp.float32)
    if corr_method in ("band", "band_pallas"):
        return _gicp_band_sorted(
            source, target, max_dist, T0, loss, gm_k, max_iteration,
            relative_fitness, relative_rmse,
            "pallas" if corr_method == "band_pallas" else "xla",
            axis_name=axis_name,
        )
    src_cov = regularize_covariances(source.covariances)
    tgt_cov = regularize_covariances(target.covariances)
    band_backend = "xla"
    if corr_method == "grid":
        accel = grid_nn.build_grid(target.points, target.mask, max_dist)
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
            band_backend=band_backend, axis_name=axis_name,
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
        source.points, source.mask, target.points, target.mask, T, max_dist,
        accel, band_backend,
    )
    fitness, rmse, n_corr = _metrics(valid, d2, source.mask, axis_name)
    return RegistrationResult(T, fitness, rmse, n_corr, iters)


def _gicp_band_sorted(
    source: Cloud,
    target: Cloud,
    max_dist,
    T0,
    loss: str,
    gm_k: float,
    max_iteration: int,
    relative_fitness: float,
    relative_rmse: float,
    backend: str,
    q_tile: int = 1024,
    axis_name: str | None = None,
):
    """Band-accelerated GICP that LIVES in sorted query space.

    The naive band loop pays a q_order gather + two scatters back to original
    order every iteration (~3 ms/iter at 32k points, measured — dominating the
    whole Gauss-Newton step).  But every loop output (H, g, fitness, rmse) is
    a permutation-invariant reduction, so we permute the source arrays ONCE
    into the index's grouped order and never leave it; target-side arrays are
    pre-permuted into ref-sorted order so correspondence gathers use sorted
    rows directly.

    Two more TPU moves: (1) a regularized GICP covariance is EXACTLY the
    plane-disk form I - (1-eps) n n^T (eigenvalues clamped to (eps, 1, 1) with
    the normal as the eps-direction), so the per-correspondence Mahalanobis
    matrix needs only the two unit normals:
        C_q + R C_p R^T = 2I - (1-eps)(m m^T + u u^T),  u = R n_p,
    which turns the per-iteration (N,3,3) covariance gather into a single
    packed (N, 8) row gather [q | m | 0 0].  (2) the 6x6 solve is an unrolled
    scalar Cholesky (``jnp.linalg.solve`` loops ~1 ms/iter on TPU).
    One iteration lands at well under 1 ms instead of ~5.5 ms at 32k points.
    """
    a = jnp.float32(1.0 - GICP_EPSILON)
    src_n = _unit_normals(source)
    tgt_n = _unit_normals(target)

    # Capacity-scaled band: per-iteration correspondence cost is
    # nq_pad x 2*band and the solve is iteration-bound (measured ~0.5 ms/GN
    # iteration at 17k rows, band 2048 — the sweep dominates).  nr/8 rows
    # either side covers ~extent/4 along the sweep axis, far beyond the
    # reference's max_correspondence_distance schedules on MLS scans; the
    # 1024 cap halves the finest-scale sweep (NCLT needs ~17 rows of radius
    # there).  At TLS density (Courtyard 240k) the cap deepens the existing
    # slab truncation at coarse scales — same approximation class the
    # committed 240k evidence already tolerates (nightly fitness guards).
    nr0 = target.points.shape[0]
    band = min(1024, max(512, -(-(nr0 // 8) // 256) * 256))
    p0 = se3.transform_points(T0, source.points)
    index = band_nn.build_band_index(p0, source.mask, target.points,
                                     target.mask, band=band)

    nq = source.points.shape[0]
    nq_pad = -(-nq // q_tile) * q_tile
    nr = target.points.shape[0]
    nr_pad = index.r_sorted.shape[0]
    qo = index.q_order
    src_pts_s = jnp.pad(source.points[qo], ((0, nq_pad - nq), (0, 0)),
                        constant_values=band_nn.SENTINEL)
    src_n_s = jnp.pad(src_n[qo], ((0, nq_pad - nq), (0, 0)))
    src_mask_s = jnp.pad(source.mask[qo], (0, nq_pad - nq), constant_values=False)
    # packed target rows in sorted order: [x y z | nx ny nz | 0 0]
    tgt_n_sorted = jnp.pad(tgt_n[index.r_order], ((0, nr_pad - nr), (0, 0)))
    tgt_pack = jnp.concatenate(
        [index.r_sorted, tgt_n_sorted, jnp.zeros((nr_pad, 2), jnp.float32)], axis=1)

    eye3 = jnp.eye(3, dtype=jnp.float32)

    def corr_step(T):
        p = se3.transform_points(T, src_pts_s)
        d2a, i_s = band_nn.nn1_band_query_sorted(
            index, p, src_mask_s, max_dist, q_tile=q_tile, band=band,
            backend=backend, rescore=False)
        pack = tgt_pack[i_s]                                 # (N, 8) one gather
        q, m = pack[:, :3], pack[:, 3:6]
        d = q - p
        d2 = jnp.sum(d * d, axis=1)
        valid = src_mask_s & (d2a < band_nn.BIG) & (d2 <= max_dist * max_dist)
        return p, m, d, d2, valid

    def step(T):
        p, m, d, d2, valid = corr_step(T)
        fitness, rmse, n_corr = _metrics(valid, d2, src_mask_s, axis_name)

        R = se3.rot(T)
        u = src_n_s @ R.T                                    # R n_p, (N, 3)
        C = 2.0 * eye3 - a * (
            m[:, :, None] * m[:, None, :] + u[:, :, None] * u[:, None, :]
        )
        M = _inv3(C)

        r_norm = jnp.sqrt(jnp.maximum(d2, 1e-16))
        w = robust_weight(loss, r_norm, gm_k) * valid.astype(jnp.float32)

        G = jnp.concatenate(
            [se3.skew(p), jnp.broadcast_to(-eye3, p.shape + (3,))], axis=-1)
        MG = jnp.einsum("nij,njk->nik", M, G)
        H = jnp.einsum("nij,nik,n->jk", G, MG, w)
        g = jnp.einsum("nij,nik,nk,n->j", G, M, d, w)

        if axis_name is not None:  # point-sharded normal equations
            H, g = jax.lax.psum((H, g), axis_name)
        lam = 1e-6 * (jnp.trace(H) / 6.0 + 1.0)
        H = H + lam * jnp.eye(6, dtype=H.dtype)
        xi = -solve6_cholesky(H, g)
        xi = jnp.where(n_corr > 0, xi, 0.0)
        T_new = se3.compose(se3.se3_exp(xi), T)
        return T_new, fitness, rmse, n_corr

    def cond(state):
        _, _, _, _, it, done = state
        return (it < max_iteration) & ~done

    def body(state):
        T, fit_prev, rmse_prev, _, it, _ = state
        T_new, fit, rmse, n_corr = step(T)
        done = (jnp.abs(fit - fit_prev) < relative_fitness) & (
            jnp.abs(rmse - rmse_prev) < relative_rmse
        )
        done = done | (n_corr == 0)
        return (T_new, fit, rmse, n_corr, it + 1, done)

    init = (T0, jnp.float32(-1.0), jnp.float32(-1.0), jnp.float32(0.0), 0, False)
    T, _, _, _, iters, _ = jax.lax.while_loop(cond, body, init)

    # FINAL metrics at the un-capped band: the 1024 iteration cap can
    # truncate in-radius correspondences at TLS density (Courtyard 240k:
    # reported finest-scale fitness fell 0.90 -> 0.67 while the pose was
    # unchanged), so the once-per-registration reported fitness/rmse counts
    # over the full nr/8 slab — one extra index build + sweep (~1-2 ms).
    band_f = min(2048, max(512, -(-(nr0 // 8) // 256) * 256))
    if band_f != band:
        p_f = se3.transform_points(T, src_pts_s)
        index_f = band_nn.build_band_index(
            p_f, src_mask_s, target.points, target.mask, band=band_f)
        d2f, _ = band_nn.nn1_band_query(
            index_f, p_f, src_mask_s, max_dist, band=band_f)
        valid = src_mask_s & (d2f < band_nn.BIG)
        fitness, rmse, n_corr = _metrics(valid, d2f, src_mask_s, axis_name)
    else:
        _, _, _, d2, valid = corr_step(T)
        fitness, rmse, n_corr = _metrics(valid, d2, src_mask_s, axis_name)
    return RegistrationResult(T, fitness, rmse, n_corr, iters)


def _unit_normals(c: Cloud) -> jnp.ndarray:
    """Unit normals for the plane-disk GICP covariance: the cloud's normals if
    present, else the smallest eigenvector of its covariances (what
    ``regularize_covariances`` clamps toward)."""
    if c.normals is not None:
        return c.normals
    if c.covariances is None:
        raise ValueError("GICP needs normals or covariances on both clouds")
    _, V = eigen3.eigh3(c.covariances)
    return V[..., :, 0]


@functools.partial(
    jax.jit, static_argnames=("loss", "max_iteration", "corr_method")
)
def gicp_loss_log(
    source: Cloud,
    target: Cloud,
    max_corr_dist,
    T_init,
    loss: str = "l1",
    gm_k: float = 1.0,
    max_iteration: int = 100,
    corr_method: str = "grid",
):
    """Diagnostic GICP run with a per-iteration loss log.

    The reference plots Open3D's ``loss_log`` (``plot_rmse_vs_iteracoes`` /
    ``plot_RMSE_vs_iteracoes_por_escala``, ALL_FUNCTIONS.py:843-866), which
    requires running ICP with log_loss=True.  Here the full iteration budget
    runs under ``lax.scan`` (fixed trip count — no early exit, so the log has
    static shape) and returns ``(RegistrationResult, log)`` with
    ``log = {"fitness": (I,), "inlier_rmse": (I,)}``.

    Not the hot path: use ``registration_gicp`` for production registration.
    """
    max_dist = jnp.float32(max_corr_dist)
    T0 = jnp.asarray(T_init, jnp.float32)
    src_cov = regularize_covariances(source.covariances)
    tgt_cov = regularize_covariances(target.covariances)
    accel = (
        grid_nn.build_grid(target.points, target.mask, max_dist)
        if corr_method == "grid" else None
    )

    def step(T, _):
        T_new, fit, rmse, n_corr = gicp_step(
            source.points, src_cov, source.mask,
            target.points, tgt_cov, target.mask,
            T, max_dist, loss=loss, gm_k=gm_k, accel=accel,
        )
        return T_new, (fit, rmse)

    T, (fit_log, rmse_log) = jax.lax.scan(step, T0, None, length=max_iteration)
    _, _, valid, d2 = _correspond(
        source.points, source.mask, target.points, target.mask, T, max_dist,
        accel,
    )
    fitness, rmse, n_corr = _metrics(valid, d2, source.mask)
    res = RegistrationResult(T, fitness, rmse, n_corr, jnp.int32(max_iteration))
    return res, {"fitness": fit_log, "inlier_rmse": rmse_log}
