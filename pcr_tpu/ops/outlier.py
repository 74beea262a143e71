"""Statistical outlier removal (SURVEY N3).

Replaces ``PointCloud.remove_statistical_outlier(nb_neighbors, std_ratio)``
(reference call sites ``2_MGICP_refinement...py:149-150`` with knn=30,
std=1.0).  Semantics follow Open3D: for each point compute the mean distance to
its nb_neighbors nearest neighbors (excluding itself); drop points whose mean
distance exceeds mean + std_ratio * std of those per-point means.  Shapes stay
static — removal just clears the mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_ops
from ..utils.cloud import Cloud


@functools.partial(jax.jit, static_argnames=("nb_neighbors",))
def statistical_outlier_mask(
    points: jnp.ndarray, mask: jnp.ndarray, nb_neighbors: int = 30, std_ratio: float = 1.0
) -> jnp.ndarray:
    """Returns the filtered validity mask (True = keep)."""
    # rescore=False: the matmul-metric error (~1e-3 m^2) moves mean neighbor
    # distances by well under the mu + std_ratio*sigma threshold's own slack.
    d2, _ = knn_ops.knn(points, points, mask, nb_neighbors, exclude_self=True,
                        rescore=False)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    neighbor_valid = d2 < knn_ops.BIG
    counts = jnp.sum(neighbor_valid, axis=1)
    mean_d = jnp.sum(jnp.where(neighbor_valid, d, 0.0), axis=1) / jnp.maximum(counts, 1)

    w = mask.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(mean_d * w) / n_valid
    # Open3D uses the unbiased (n-1) sample variance of the per-point means
    var = jnp.sum((mean_d - mu) ** 2 * w) / jnp.maximum(n_valid - 1.0, 1.0)
    thresh = mu + std_ratio * jnp.sqrt(var)
    return mask & (mean_d <= thresh)


def remove_statistical_outliers(c: Cloud, nb_neighbors: int = 30, std_ratio: float = 1.0) -> Cloud:
    new_mask = statistical_outlier_mask(c.points, c.mask, nb_neighbors, std_ratio)
    # Park removed points at the sentinel so distance kernels never see them.
    from ..utils.cloud import PAD_COORD

    pts = jnp.where(new_mask[:, None], c.points, PAD_COORD)
    return c.with_(points=pts, mask=new_mask)
