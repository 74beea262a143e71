"""Registration evaluation & information matrices (SURVEY N8, N10, P12).

Replaces:
  * ``o3d.pipelines.registration.evaluate_registration`` (ALL_FUNCTIONS.py:809)
  * ``get_information_matrix_from_point_clouds`` (3_...py:317-320)
  * ``calculate_RMSE_and_fitness`` circuit sweep (ALL_FUNCTIONS.py:801-824)

Twist/block ordering is (omega, t) — rotation first — consistent with se3.py
and the pose-graph solver.

Correspondence search: the sorted-space band sweep (ops/band_nn) by default —
stage 3 runs one information matrix per circuit pair (901 at NCLT scale,
240k-point clouds at Courtyard scale), and the band's contiguous slab gather
beats the full O(Nq*Nr) brute scan by the pruning ratio.  ``method='exact'``
keeps the tiled brute-force path for oracle tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import band_nn
from ..ops import knn as knn_ops
from ..utils import se3
from ..utils.cloud import Cloud


def _nn_within(p, p_mask, target: Cloud, max_dist, method: str, band: int):
    """(sqdist, index) of each source point's nearest target within max_dist;
    out-of-range entries get sqdist >= BIG."""
    if method == "band":
        return band_nn.nn1_band(
            p, p_mask, target.points, target.mask, max_dist, band=band
        )
    d2, j = knn_ops.nn1(p, target.points, target.mask)
    return jnp.where(d2 <= jnp.float32(max_dist) ** 2, d2, knn_ops.BIG), j


@functools.partial(jax.jit, static_argnames=("method", "band"))
def evaluate_registration(
    source: Cloud, target: Cloud, max_dist, T, method: str = "band",
    band: int = 2048,
):
    """fitness = inlier fraction, inlier_rmse over correspondences < max_dist."""
    p = se3.transform_points(jnp.asarray(T, jnp.float32), source.points)
    d2, _ = _nn_within(p, source.mask, target, max_dist, method, band)
    valid = source.mask & (d2 < knn_ops.BIG)
    n_corr = jnp.sum(valid.astype(jnp.float32))
    n_src = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
    fitness = n_corr / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.maximum(n_corr, 1.0))
    return fitness, rmse, n_corr


@functools.partial(jax.jit, static_argnames=("method", "band"))
def information_matrix(
    source: Cloud, target: Cloud, max_dist, T, method: str = "band",
    band: int = 2048,
):
    """6x6 information matrix Sum G^T G over inlier correspondences at pose T
    (Open3D ``get_information_matrix_from_point_clouds`` semantics: G built
    from the matched *target* points q as [-skew(q) | I])."""
    p = se3.transform_points(jnp.asarray(T, jnp.float32), source.points)
    d2, j = _nn_within(p, source.mask, target, max_dist, method, band)
    valid = source.mask & (d2 < knn_ops.BIG)
    q = target.points[j]
    G = jnp.concatenate(
        [-se3.skew(q), jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape + (3,))],
        axis=-1,
    )  # (N, 3, 6)
    w = valid.astype(jnp.float32)
    return jnp.einsum("nij,nik,n->jk", G, G, w)


# Batched variants: vmap over stacked Cloud pairs (stage 3 computes one
# information matrix per circuit pair — batching amortizes dispatch).
@functools.partial(jax.jit, static_argnames=("method", "band"))
def information_matrix_batch(
    source: Cloud, target: Cloud, max_dist, T, method: str = "band",
    band: int = 2048,
):
    f = functools.partial(information_matrix, method=method, band=band)
    return jax.vmap(f, in_axes=(0, 0, None, 0))(source, target, max_dist, T)


@functools.partial(jax.jit, static_argnames=("method", "band"))
def evaluate_registration_batch(
    source: Cloud, target: Cloud, max_dist, T, method: str = "band",
    band: int = 2048,
):
    f = functools.partial(evaluate_registration, method=method, band=band)
    return jax.vmap(f, in_axes=(0, 0, None, 0))(source, target, max_dist, T)


def aligned_ate(absolute_poses, target_poses):
    """SE(3)-Umeyama-aligned absolute trajectory error — the standard ATE of
    the trajectory-evaluation literature (and the target-invariant ruler the
    reference's single-groundtruth comparison at 3_...py:368-372 implies):
    rigidly align the estimated positions to the target positions with the
    Kabsch/Umeyama closed form (no scale), then report translation residual
    statistics.  Removes the global-frame gauge (which node is identity, and
    most of the composition-convention gap between the reference's
    reversed-rotation chain and the standard SE(3) chain), so trajectories
    produced in EITHER convention can be scored against one physical target
    curve.  Host-side f64 numpy.
    """
    import numpy as np

    p = np.asarray(absolute_poses, np.float64)[:, :3, 3]
    q = np.asarray(target_poses, np.float64)[:, :3, 3]
    mu_p, mu_q = p.mean(axis=0), q.mean(axis=0)
    H = (p - mu_p).T @ (q - mu_q)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    res = np.linalg.norm(q - ((p - mu_p) @ R.T + mu_q), axis=1)
    return {
        "rmse_m": float(np.sqrt(np.mean(res**2))),
        "mean_m": float(res.mean()),
        "median_m": float(np.median(res)),
        "max_m": float(res.max()),
    }


def circuit_edge_consistency(absolute_poses, relative_poses,
                             convention: str = "reference"):
    """Per-edge agreement between a trajectory and the measured relative poses
    — the quantitative 'did global refinement beat the raw chain' statement
    the reference reads off its groundtruth plots (3_...py:368-400; no
    groundtruth ships, so consistency with the measured edges is the
    intrinsic metric).

    For edge k (pair ((k+1) % n, k)) the trajectory implies
    T_impl = compose_ref(A_{(k+1)%n}, invert(A_k)) — the reference's own
    absolute->relative recovery (``poses_absolutas_para_relativas``,
    ALL_FUNCTIONS.py:831-837), the exact inverse of its chain composition, so
    the raw chain satisfies edges 0..n-2 to machine precision and dumps the
    whole circuit closure on edge n-1 (NCLT: 40.82 m from the fixtures); a
    refined trajectory distributes it.  (Translation agrees with the standard
    inv(A_k) @ A_{k+1}; only the rotation order differs — SURVEY P11's
    ``compor_duas_poses`` quirk.)  Host-side f64 numpy (901-pose chains lose
    centimeters in f32).  Returns {dR: (n,), dt: (n,)} plus summary floats.

    ``convention`` picks the absolute->relative recovery the trajectory is
    scored against: "reference" (default) uses the reference's own
    ``poses_absolutas_para_relativas`` (reversed rotation order), under which
    its chain (``se3.relative_to_absolute``) scores perfectly; "standard"
    uses rel[k] = inv(A_k) @ A_{(k+1)%n}, under which the standard chain
    (``se3.relative_to_absolute_standard``) — and any Open3D-style
    pose-graph output — scores perfectly.  The two recoveries differ in
    ROTATION by the conjugation gap (~0.03 rad/edge on NCLT); a trajectory
    must be scored in its native convention or that gap masquerades as
    inconsistency.
    """
    import numpy as np

    if convention not in ("reference", "standard"):
        # a typo like 'std' would silently fall into the reference recovery
        # and mis-score a standard-convention trajectory by the ~0.03 rad/edge
        # conjugation gap (ADVICE r4)
        raise ValueError(
            f"convention must be 'reference' or 'standard', got {convention!r}")
    A = np.asarray(absolute_poses, np.float64)
    rel = np.asarray(relative_poses, np.float64)
    n = A.shape[0]
    A_next = np.concatenate([A[1:], A[:1]])
    if convention == "standard":
        impl = np.asarray(se3.compose(se3.invert(A), A_next))
    else:
        impl = np.asarray(se3.compose_ref(A_next, se3.invert(A)))
    dR = np.linalg.norm(impl[:, :3, :3] - rel[:, :3, :3], axis=(1, 2)) * np.sqrt(2) / 2
    dt = np.linalg.norm(impl[:, :3, 3] - rel[:, :3, 3], axis=1)
    return {
        "dR": dR, "dt": dt,
        "dt_max_m": float(dt.max()), "dt_mean_m": float(dt.mean()),
        "dt_closure_edge_m": float(dt[-1]),
        "dR_max": float(dR.max()), "dR_mean": float(dR.mean()),
    }
