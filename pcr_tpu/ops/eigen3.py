"""Batched closed-form symmetric 3x3 eigendecomposition (no LAPACK).

Replaces the eigen solves inside Open3D's C++ normal/covariance estimation
(reference call sites: ``estimate_normals`` at ``1_...py:44-46``,
``2_...py:152-153``; SVD at ``ALL_FUNCTIONS.py:1045``).  Fully vmappable and
TPU-friendly: trigonometric eigenvalues + cross-product eigenvectors, no
data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigh3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalues (ascending) and eigenvectors of symmetric (..., 3, 3).

    Returns (w, V) with w (..., 3) ascending and V (..., 3, 3) whose columns
    V[..., :, i] are unit eigenvectors. Accuracy ~1e-6 relative for
    well-conditioned inputs; degenerate (repeated-eigenvalue) inputs get a
    valid orthonormal basis.
    """
    A = jnp.asarray(A)
    # Scale for numerical range
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True), 1e-30)
    B = A / scale

    q = jnp.trace(B, axis1=-2, axis2=-1) / 3.0
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), B.shape)
    C = B - q[..., None, None] * eye
    p2 = jnp.sum(C * C, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detC = (
        C[..., 0, 0] * (C[..., 1, 1] * C[..., 2, 2] - C[..., 1, 2] * C[..., 2, 1])
        - C[..., 0, 1] * (C[..., 1, 0] * C[..., 2, 2] - C[..., 1, 2] * C[..., 2, 0])
        + C[..., 0, 2] * (C[..., 1, 0] * C[..., 2, 1] - C[..., 1, 1] * C[..., 2, 0])
    )
    # p**3 underflows f32 for near-isotropic inputs; clamp the denominator.
    r = jnp.clip(detC / jnp.maximum(2.0 * p * p * p, 1e-30), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues: ascending order
    w2 = q + 2.0 * p * jnp.cos(phi)                       # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2
    w = jnp.stack([w0, w1, w2], axis=-1)

    # Eigenvectors via cross products of (B - w I) rows: for eigenvalue wi,
    # rows of (B - wj I)(B - wk I) span the eigenvector direction.
    def eigvec(wa, wb):
        M = (B - wa[..., None, None] * eye) @ (B - wb[..., None, None] * eye)
        # pick the column of M with the largest norm (M's columns all lie along
        # the eigenvector of the remaining eigenvalue)
        norms = jnp.sum(M * M, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # Degenerate fallback: if the product vanished (repeated eigenvalues),
        # substitute a canonical axis; orthonormalization happens below.
        v = jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), jnp.zeros_like(v))
        return v

    v0 = eigvec(w1, w2)
    v2 = eigvec(w0, w1)
    # Handle degeneracy: if v0/v2 vanished, build an orthonormal frame.
    def fallback(v, other):
        bad = jnp.sum(v * v, axis=-1, keepdims=True) < 0.5
        # pick axis least aligned with `other`
        a = jnp.abs(other)
        axis = jnp.argmin(a, axis=-1)
        cand = jnp.eye(3, dtype=A.dtype)[axis]
        o = cand - other * jnp.sum(cand * other, axis=-1, keepdims=True)
        o = o / jnp.maximum(jnp.linalg.norm(o, axis=-1, keepdims=True), 1e-30)
        return jnp.where(bad, o, v)

    # ensure at least one valid vector: if both degenerate (isotropic), use x/z
    both_bad = (jnp.sum(v0 * v0, axis=-1, keepdims=True) < 0.5) & (
        jnp.sum(v2 * v2, axis=-1, keepdims=True) < 0.5
    )
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], A.dtype), v0.shape)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], A.dtype), v2.shape)
    v0 = jnp.where(both_bad, ex, v0)
    v2 = jnp.where(both_bad, ez, v2)
    v0 = fallback(v0, v2)
    v2 = fallback(v2, v0)
    # Re-orthogonalize v2 against v0 and complete the frame
    v2 = v2 - v0 * jnp.sum(v2 * v0, axis=-1, keepdims=True)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-30)
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w * scale[..., 0], V


def smallest_eigenvector(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue (the surface normal)."""
    _, V = eigh3(A)
    return V[..., :, 0]
