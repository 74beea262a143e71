"""Point-to-point transform estimation & manual-registration math (SURVEY N12,
P15, P18).

The reference's interactive picking UI (``registro_manual``,
``ALL_FUNCTIONS.py:423-442``) is Open3D-window-bound; the math underneath is
the Umeyama/Kabsch SVD (``TransformationEstimationPointToPoint``), which is
what we provide: given >= 3 picked correspondences, the closed-form rigid
transform.  Headless flows pass index pairs instead of clicks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import se3


def estimate_point_to_point(source_pts, target_pts, weights=None) -> jnp.ndarray:
    """Kabsch/Umeyama closed form: rigid T minimizing sum w ||T p - q||^2.

    source_pts/target_pts: (N, 3) matched pairs. Returns (4, 4).
    """
    xp = np if isinstance(source_pts, np.ndarray) else jnp
    p = xp.asarray(source_pts, dtype=xp.float64 if xp is np else jnp.float32)
    q = xp.asarray(target_pts, dtype=p.dtype)
    if weights is None:
        w = xp.ones(p.shape[0], dtype=p.dtype)
    else:
        w = xp.asarray(weights, dtype=p.dtype)
    w = w / xp.sum(w)
    mu_p = xp.einsum("n,ni->i", w, p)
    mu_q = xp.einsum("n,ni->i", w, q)
    H = xp.einsum("n,ni,nj->ij", w, p - mu_p, q - mu_q)
    U, S, Vt = xp.linalg.svd(H)
    # reflection guard: det(V U^T) = -1 flips the smallest singular direction
    d = xp.sign(xp.linalg.det(Vt.T @ U.T))
    D = xp.diag(xp.stack([xp.ones_like(d), xp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = mu_q - R @ mu_p
    return se3.make_pose(R, t)


def manual_registration(source_pts, target_pts, picked_src, picked_tgt) -> jnp.ndarray:
    """``registro_manual`` math (ALL_FUNCTIONS.py:423-442) with picked index
    lists instead of UI clicks; requires >= 3 correspondences."""
    picked_src = np.asarray(picked_src)
    picked_tgt = np.asarray(picked_tgt)
    if len(picked_src) < 3 or len(picked_src) != len(picked_tgt):
        raise ValueError("need >= 3 matched picks on each cloud")
    return estimate_point_to_point(
        np.asarray(source_pts)[picked_src], np.asarray(target_pts)[picked_tgt]
    )


def random_rotation_matrix(deflection: float = 1.0, rng=None) -> np.ndarray:
    """Householder-on-sphere random rotation (``rand_rotation_matrix``,
    ALL_FUNCTIONS.py:942-960)."""
    rng = rng or np.random.default_rng()
    theta, phi, z = rng.uniform(size=3)
    theta *= 2.0 * deflection * np.pi
    phi *= 2.0 * np.pi
    z *= 2.0 * deflection
    r = np.sqrt(z)
    V = np.array([np.sin(phi) * r, np.cos(phi) * r, np.sqrt(2.0 - z)])
    st, ct = np.sin(theta), np.cos(theta)
    Rz = np.array([[ct, st, 0.0], [-st, ct, 0.0], [0.0, 0.0, 1.0]])
    return (np.outer(V, V) - np.eye(3)) @ Rz


def flatten_to_xy(points: jnp.ndarray) -> jnp.ndarray:
    """``planificar_nuvens_em_xy`` (ALL_FUNCTIONS.py:162-170): z := 0."""
    return points.at[..., 2].set(0.0) if hasattr(points, "at") else np.concatenate(
        [points[..., :2], np.zeros_like(points[..., 2:3])], axis=-1
    )
