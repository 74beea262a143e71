"""Normal & covariance estimation (SURVEY N4, N11).

Replaces Open3D's ``estimate_normals`` / ``estimate_covariances``:
  * KNN(k) search (``2_...py:152-153``, knn=20)
  * Hybrid(radius, max_nn) search (``1_...py:44-46``, radius=2*voxel, max_nn=20)
  * covariance of the neighbor set, normal = smallest eigenvector (closed-form
    batched 3x3 eigendecomposition — no LAPACK, fully on the VPU/MXU)

Normal orientation: eigenvectors have arbitrary sign; like Open3D (which
orients to the +Z half-space via ``OrientNormalsToAlignWithDirection`` default
behavior in ``EstimateNormals``), we flip so n_z >= 0 (ties broken by n_x).
GICP uses only the covariances, so the sign convention is cosmetic for
registration; it matters only for FPFH angle features where a consistent
convention on both clouds is what counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import eigen3
from . import knn as knn_ops
from ..utils.cloud import Cloud


def _neighbor_moments(points, idx, valid):
    """Mean & covariance over neighbor sets.

    points (N, 3); idx (N, k); valid (N, k) -> mean (N, 3), cov (N, 3, 3).
    The covariance is the population covariance over valid neighbors (matching
    Open3D's ComputeCovariance normalization by the neighbor count).
    """
    nb = points[idx]                                   # (N, k, 3)
    w = valid.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)       # (N, 1)
    mean = jnp.sum(nb * w, axis=1) / count
    centered = (nb - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[..., None]
    return mean, cov


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals_knn(points, mask, k: int = 20):
    """KNN normals+covariances. Neighborhood includes the query point itself
    (Open3D's KNN search returns the query as its own first neighbor)."""
    # rescore=False: d2 is recomputed exactly from the gathered coordinates.
    _, idx = knn_ops.knn(points, points, mask, k, rescore=False)
    d2 = knn_ops.exact_sqdist(points[:, None, :], points[idx])
    valid = (d2 < knn_ops.BIG) & mask[:, None]
    return _finish_normals(points, mask, idx, valid)


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals_hybrid(points, mask, radius, k: int = 20):
    """Hybrid(radius, max_nn) normals, as in registro_FGR (1_...py:44-46)."""
    # rescore=False: the radius gate tolerates the matmul-metric's ~1e-3 m^2
    # error (radius^2 is O(1e-2..1e2) at the reference's scales).
    d2, idx = knn_ops.knn(points, points, mask, k, rescore=False)
    valid = (d2 <= jnp.float32(radius) ** 2) & mask[:, None]
    return _finish_normals(points, mask, idx, valid)


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals_hybrid_from_knn(points, mask, d2, idx, radius, k: int = 20):
    """Hybrid(radius, k) normals reusing a precomputed self-excluded kNN
    (``knn(..., exclude_self=True)``, >= k-1 columns, ascending).

    The neighborhood is the query point itself plus its k-1 nearest within
    ``radius`` — the same set Open3D's hybrid search returns (its KNN counts
    the query as its own first neighbor).  Lets fgr_features share one
    selection between normals (k=20) and FPFH (k=200) instead of paying two.
    """
    n = points.shape[0]
    self_idx = jnp.arange(n, dtype=jnp.int32)
    idx_k = jnp.concatenate([self_idx[:, None], idx[:, : k - 1]], axis=1)
    d2_k = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.float32), d2[:, : k - 1]], axis=1
    )
    valid = (d2_k <= jnp.float32(radius) ** 2) & mask[:, None]
    return _finish_normals(points, mask, idx_k, valid)


def _finish_normals(points, mask, idx, valid):
    _, cov = _neighbor_moments(points, idx, valid)
    enough = jnp.sum(valid, axis=1) >= 3
    normals = eigen3.smallest_eigenvector(cov)
    # Deterministic sign: nz >= 0, tie-break on nx
    flip = (normals[:, 2] < 0) | ((normals[:, 2] == 0) & (normals[:, 0] < 0))
    normals = jnp.where(flip[:, None], -normals, normals)
    normals = jnp.where((enough & mask)[:, None], normals, 0.0)
    return normals, cov


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_covariances(points, mask, k: int = 30):
    """Open3D ``estimate_covariances`` default: KNN(30) neighbor covariance
    (ALL_FUNCTIONS.py:216-217)."""
    _, idx = knn_ops.knn(points, points, mask, k, rescore=False)
    d2 = knn_ops.exact_sqdist(points[:, None, :], points[idx])
    valid = (d2 < knn_ops.BIG) & mask[:, None]
    _, cov = _neighbor_moments(points, idx, valid)
    return cov


def with_normals_knn(c: Cloud, k: int = 20) -> Cloud:
    normals, cov = estimate_normals_knn(c.points, c.mask, k)
    return c.with_(normals=normals, covariances=cov)


def with_normals_hybrid(c: Cloud, radius, k: int = 20) -> Cloud:
    normals, cov = estimate_normals_hybrid(c.points, c.mask, radius, k)
    return c.with_(normals=normals, covariances=cov)


def cloud_mean_and_covariance(points, mask):
    """``compute_mean_and_covariance`` (ALL_FUNCTIONS.py:1043) over the whole
    cloud."""
    w = mask.astype(jnp.float32)[:, None]
    count = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w, axis=0) / count
    centered = (points - mean) * w
    cov = centered.T @ centered / count
    return mean, cov
