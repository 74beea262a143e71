"""Eigen-value features & multiscale sampling experiment (SURVEY P13, P14).

  * ``extract_eigen_features`` (ALL_FUNCTIONS.py:1033-1058): center +
    normalize the cloud, whole-cloud covariance, SVD eigenvalues ->
    linearity / planarity / sphericity / curvature / anisotropy /
    omnivariance / eigen-sum.  The reference's exact formulas are kept,
    including its quirky anisotropy expression (s0 - s2/s0).
  * ``multiscale_random_sampling`` (``amostragem_multiescala_otimizada``,
    ALL_FUNCTIONS.py:235-254): target sizes from the fitted exponential model
    a*exp(-b*s) with a=1.18397758, b=5.09388767.  The reference's hardcoded
    [1:10] slice bug (SURVEY §2.1) is not replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import normals as normals_ops
from ..utils.cloud import Cloud

SAMPLING_A = 1.18397758
SAMPLING_B = 5.09388767


@jax.jit
def extract_eigen_features(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Returns the 7-vector [lin, pla, sph, cur, ani, omn, eig_sum]."""
    w = mask.astype(jnp.float32)[:, None]
    count = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(points * w, axis=0) / count
    centered = (points - centroid) * w
    # normalize by the max corner norm (ALL_FUNCTIONS.py:1038)
    big = jnp.float32(3e38)
    mx = jnp.max(jnp.where(mask[:, None], centered, -big), axis=0)
    mn = jnp.min(jnp.where(mask[:, None], centered, big), axis=0)
    scale = jnp.maximum(jnp.maximum(jnp.linalg.norm(mx), jnp.linalg.norm(mn)), 1e-12)
    normed = centered / scale
    cov = normed.T @ (normed * w) / count
    s = jnp.linalg.svd(cov, compute_uv=False)  # descending
    eig_sum = s[0] + s[1] + s[2]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-30)
    lin = (s[0] - s[1]) / s[0]
    pla = (s[1] - s[2]) / s[0]
    sph = s[2] / s[0]
    cur = s[2] / (s[0] + s[1] + s[2])
    ani = s[0] - s[2] / s[0]            # reference's exact (unparenthesized) form
    omn = (s[0] * s[1] * s[2]) ** (1.0 / 3.0)
    return jnp.stack([lin, pla, sph, cur, ani, omn, eig_sum])


def multiscale_sampling_fractions(n_scales: int, voxel_inicial: float):
    """Normalized per-scale random-sampling fractions from the exponential
    density model (linear scale growth, ALL_FUNCTIONS.py:240-246)."""
    scales = jnp.asarray([voxel_inicial + voxel_inicial * i for i in range(n_scales)])
    fractions = SAMPLING_A * jnp.exp(-SAMPLING_B * scales)
    return fractions / jnp.linalg.norm(fractions)


def random_downsample(c: Cloud, fraction, seed: int = 0) -> Cloud:
    """Random downsample keeping ~fraction of valid points (fixed shape)."""
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (c.capacity,))
    keep = c.mask & (u < fraction)
    from ..utils.cloud import PAD_COORD

    pts = jnp.where(keep[:, None], c.points, PAD_COORD)
    return c.with_(points=pts, mask=keep)
