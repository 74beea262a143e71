"""Pure-JAX quaternion algebra (with a numpy float64 host path).

TPU-native replacement for the ``numpy-quaternion`` C extension used by the
reference (``ALL_FUNCTIONS.py:5``, ``3_Global_Optimizations_in_NCLT_dataset.py:2``):
``from_rotation_matrix`` / ``as_rotation_matrix`` / Hamilton product / inverse /
``slerp``.  Everything here is shape-polymorphic over leading batch dimensions
and fully vmappable/jittable, so circuits of n quaternions are processed as a
single ``(n, 4)`` array instead of Python lists.

Namespace polymorphism: every function dispatches on its inputs — host numpy
arrays stay numpy (and can therefore run in float64, which quaternion chains
of ~900 links need for fixture-grade accuracy, mirroring ``se3._ns``), while
jax arrays/tracers stay on-device.

Convention: q = (w, x, y, z), Hamilton product, unit quaternions represent
rotations acting as R(q) p.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _ns(*arrays):
    """numpy iff every array input is host numpy (scalars ignored)."""
    arrs = [a for a in arrays if not isinstance(a, (int, float))]
    return np if arrs and all(isinstance(a, np.ndarray) for a in arrs) else jnp


def qmul(q1, q2):
    """Hamilton product q1 * q2. Shapes broadcast over leading dims; last dim 4."""
    xp = _ns(q1, q2)
    w1, x1, y1, z1 = xp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = xp.moveaxis(q2, -1, 0)
    return xp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q):
    return q * _ns(q).asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q):
    """Inverse; for unit quaternions this is the conjugate."""
    return qconj(q) / _ns(q).sum(q * q, axis=-1, keepdims=True)


def qnormalize(q, eps: float = 1e-12):
    xp = _ns(q)
    return q / xp.maximum(xp.linalg.norm(q, axis=-1, keepdims=True), eps)


def qidentity(dtype=jnp.float32):
    return jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def from_rotation_matrix(R):
    """Unit quaternion from rotation matrix, batched over leading dims.

    Uses the branch-free Shepperd/Sarabandi scheme: compute all four candidate
    quaternions from the diagonal and off-diagonal elements and select the one
    with the largest denominator (numerically stable, no data-dependent control
    flow — XLA friendly).
    """
    xp = _ns(R)
    R = xp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q*|q_k| vectors (k = w, x, y, z)
    qw = xp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = xp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = xp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = xp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Denominators 4*q_k^2 for each branch
    dens = xp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = xp.argmax(dens, axis=-1)
    cands = xp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 branches, 4)
    q = xp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = qnormalize(q)
    # Canonical sign: w >= 0 (matches numpy-quaternion's convention up to sign)
    return xp.where(q[..., :1] < 0, -q, q)


def as_rotation_matrix(q):
    """Rotation matrix from (possibly batched) unit quaternion."""
    xp = _ns(q)
    q = qnormalize(q)
    w, x, y, z = xp.moveaxis(q, -1, 0)
    r = xp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def slerp(q1, q2, t):
    """Spherical linear interpolation from q1 (t=0) to q2 (t=1).

    Shortest-path (sign-corrected) slerp, matching
    ``quaternion.quaternion_time_series.slerp(q1, q2, 0, 1, t_out=t)`` as used at
    ``3_Global_Optimizations_in_NCLT_dataset.py:179-181``.  Falls back to
    normalized lerp when the quaternions are nearly parallel.
    """
    xp = _ns(q1, q2)
    t = xp.asarray(t)
    dot = xp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = xp.where(dot < 0, -q2, q2)
    dot = xp.abs(dot)
    dot = xp.clip(dot, -1.0, 1.0)
    theta = xp.arccos(dot)
    sin_theta = xp.sin(theta)
    near = sin_theta < 1e-6
    # Guard the denominator; the `near` branch uses lerp instead.
    safe_sin = xp.where(near, 1.0, sin_theta)
    w1 = xp.where(near, 1.0 - t[..., None], xp.sin((1.0 - t[..., None]) * theta) / safe_sin)
    w2 = xp.where(near, t[..., None], xp.sin(t[..., None] * theta) / safe_sin)
    return qnormalize(w1 * q1 + w2 * q2)


def rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    xp = _ns(q, v)
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * xp.cross(qv, v)
    return v + w * t + xp.cross(qv, t)
