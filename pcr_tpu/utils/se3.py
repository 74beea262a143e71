"""SE(3) / SO(3) utilities, batched and jittable.

TPU-native re-implementation of the reference's pose math:
  * invert          — ``Invert_pose`` (3_Global_Optimizations...py:22-26)
  * compose         — standard T_a @ T_b composition
  * compose_ref     — the reference's *nonstandard* ``compor_duas_poses`` /
                      ``Acumulate_Two_Poses`` (ALL_FUNCTIONS.py:142-147,
                      3_...py:34-39): R20 = R21 @ R10 but t20 = R10 t21 + t10.
  * relative_to_absolute — ``relative_to_absolute_poses``
                      (1_FGR_pairwise_registration...py:96-122): builds absolute
                      poses with reversed-order rotation products, prepends the
                      identity and drops the final loop-closure pose.  These
                      conventions are the #1 correctness risk (SURVEY §7) and are
                      replicated exactly, but vectorized with associative scans.
  * absolute_to_relative — ``poses_absolutas_para_relativas`` (ALL_FUNCTIONS.py:831-837)
  * loop_closure_error  — ``Calcular_Erro_LoopClosure`` (ALL_FUNCTIONS.py:476-497)
  * pose_errors     — ``subtract_squared_poses`` (1_...py:17-33)
  * exp/log maps    — used by the GICP Gauss-Newton step and the pose-graph solver.

Pose arrays are (..., 4, 4) float; the twist ordering everywhere in this
codebase is (omega[3], t[3]) — rotation first — matching the information-matrix
block layout of Open3D's ``get_information_matrix_from_point_clouds``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Basic pose algebra
# ---------------------------------------------------------------------------

def _ns(*arrays):
    """Pick the array namespace: numpy iff every input is a host numpy array.

    Host (numpy) inputs run in float64 — pose chains of ~900 links need it —
    while jax inputs stay on-device in their own dtype.
    """
    return np if all(isinstance(a, np.ndarray) for a in arrays) else jnp


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) homogeneous pose from (..., 3, 3) R and (..., 3) t."""
    xp = _ns(R, t)
    R = xp.asarray(R)
    t = xp.asarray(t)
    batch = np.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = xp.broadcast_to(R, batch + (3, 3))
    t = xp.broadcast_to(t, batch + (3,))
    top = xp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4)
    )
    return xp.concatenate([top, bottom], axis=-2)


def rot(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def trans(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def invert(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (reference ``Invert_pose``, 3_...py:22-26)."""
    xp = _ns(T)
    R_inv = xp.swapaxes(rot(T), -1, -2)
    t_inv = -xp.einsum("...ij,...j->...i", R_inv, trans(T))
    return make_pose(R_inv, t_inv)


def compose(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Standard composition T_a @ T_b."""
    return _ns(T_a, T_b).matmul(T_a, T_b)


def compose_ref(T21: jnp.ndarray, T10: jnp.ndarray) -> jnp.ndarray:
    """The reference's nonstandard composition (ALL_FUNCTIONS.py:142-147).

    R20 = R21 @ R10 (reversed w.r.t. the standard convention) while
    t20 = R10 @ t21 + t10 (standard).  Kept for fixture parity.
    """
    xp = _ns(T21, T10)
    R20 = rot(T21) @ rot(T10)
    t20 = xp.einsum("...ij,...j->...i", rot(T10), trans(T21)) + trans(T10)
    return make_pose(R20, t20)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) pose to (..., N, 3) points."""
    return jnp.einsum("...ij,...nj->...ni", rot(T), pts) + trans(T)[..., None, :]


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log
# ---------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with small-angle-safe coefficients."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-32))
    use_taylor = theta2 < 1e-12
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3), (..., 3, 3) -> (..., 3).

    Implemented via the quaternion extraction (Shepperd's method, stable for
    all angles) followed by omega = 2 * atan2(|q_v|, q_w) * q_v/|q_v|; the
    direct arccos/antisymmetric formula loses ~8% magnitude within ~0.05 rad of
    pi in float32.  At exactly pi the axis sign is inherently ambiguous.
    """
    from . import quaternion as quatmod

    q = quatmod.from_rotation_matrix(R)  # w >= 0 canonical -> theta in [0, pi]
    qw = q[..., 0]
    qv = q[..., 1:]
    vn = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, qw)
    # sin(theta/2) = vn; omega = theta * axis; guard vn ~ 0 with the series
    # omega ~ 2 q_v (1 + vn^2/(6 qw^2)) for small angles.
    small = vn < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-32), theta / jnp.maximum(vn, 1e-32))
    return scale[..., None] * qv


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exp map; xi = (omega, t) ordering, (..., 6) -> (..., 4, 4)."""
    omega, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-32))
    use_taylor = theta2 < 1e-12
    R = so3_exp(omega)
    a = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        use_taylor, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_pose(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map, (..., 4, 4) -> (..., 6) with (omega, t) ordering."""
    omega = so3_log(rot(T))
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-32))
    use_taylor = theta2 < 1e-12
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    half_theta = theta / 2.0
    cot = jnp.where(
        use_taylor,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), 1e-32))
        / jnp.maximum(theta2, 1e-32),
    )
    V_inv = eye - 0.5 * K + cot[..., None, None] * (K @ K)
    v = jnp.einsum("...ij,...j->...i", V_inv, trans(T))
    return jnp.concatenate([omega, v], axis=-1)


# ---------------------------------------------------------------------------
# Reference pose-chain conventions (fixture-exact)
# ---------------------------------------------------------------------------

def _rev_matmul_scan(Rs: jnp.ndarray) -> jnp.ndarray:
    """cum[i] = R_i @ R_{i-1} @ ... @ R_0 via associative scan (O(log n) depth).

    Numpy inputs take a sequential float64 host path: circuit chains of ~900
    rotation products drift by tens of meters in float32 (measured on the NCLT
    fixtures), so fixture-grade chaining must be f64, while the traced path
    stays f32 for on-device use.
    """
    if isinstance(Rs, np.ndarray):
        out = np.empty((len(Rs), 3, 3))
        acc = np.eye(3)
        for i in range(len(Rs)):
            acc = np.float64(Rs[i]) @ acc
            out[i] = acc
        return out
    return jax.lax.associative_scan(lambda a, b: jnp.matmul(b, a), Rs, axis=0)


def relative_to_absolute(T_rel: jnp.ndarray) -> jnp.ndarray:
    """Reference ``relative_to_absolute_poses`` (1_...py:96-122), vectorized.

    Input: (n, 4, 4) relative poses [T10, T21, ..., T_{n,n-1}] (the last entry is
    usually the loop closure).  Output: (n, 4, 4) absolute poses with the
    identity prepended and the final (closure-error) pose dropped, exactly like
    the reference.

    The reference's absolute rotations are *reversed-order* products
    R_abs[i] = R_i @ R_{i-1} @ ... @ R_0 and translations accumulate as
    t_abs[i+1] = R_abs[i] @ t_{i+1} + t_abs[i].
    """
    xp = _ns(T_rel)
    n = T_rel.shape[0]
    Rs = rot(T_rel)
    ts = trans(T_rel)
    R_cum = _rev_matmul_scan(Rs)  # R_cum[i] = R_i ... R_0
    # rotated translations: d[0] = t_0 ; d[i] = R_cum[i-1] @ t_i  (i >= 1)
    rotated = xp.einsum("nij,nj->ni", R_cum[:-1], ts[1:])
    d = xp.concatenate([ts[:1], rotated], axis=0)
    t_cum = xp.cumsum(d, axis=0)
    poses = make_pose(R_cum, t_cum)  # poses[i] corresponds to node i+1
    eye = xp.eye(4, dtype=poses.dtype)[None]
    # prepend identity, drop the last (loop-closure) pose -> n poses for n nodes
    return xp.concatenate([eye, poses[: n - 1]], axis=0)


def relative_to_absolute_standard(T_rel: jnp.ndarray) -> jnp.ndarray:
    """STANDARD SE(3) chain of the same relative poses: A_0 = I and
    A_{i+1} = A_i @ rel_i, where rel_i maps frame i+1 -> i (the fixture
    files' ``pose_{i+1}_{i}`` semantics), so A_i maps frame i -> frame 0.

    This is the composition Open3D's pose-graph machinery (and any standard
    SE(3) treatment) is consistent with.  The reference's own chain
    (``relative_to_absolute``) composes rotations in REVERSED order
    (``compor_duas_poses``, ALL_FUNCTIONS.py:142-147 — the P11 quirk) and
    diverges from this chain by ~55 m over the 901-scan NCLT circuit; its
    closure error is 40.8 m in the reference convention vs 17.9 m here.
    Host numpy inputs run sequentially in f64 (900-link f32 chains drift by
    meters); traced inputs use an O(log n) associative scan.
    """
    n = T_rel.shape[0]
    if isinstance(T_rel, np.ndarray):
        out = np.empty((n, 4, 4))
        acc = np.eye(4)
        out[0] = acc
        for i in range(n - 1):
            acc = acc @ np.float64(T_rel[i])
            out[i + 1] = acc
        return out
    cum = jax.lax.associative_scan(jnp.matmul, T_rel, axis=0)
    eye = jnp.eye(4, dtype=T_rel.dtype)[None]
    return jnp.concatenate([eye, cum[: n - 1]], axis=0)


def chain_rotations_ref(Rs: jnp.ndarray) -> jnp.ndarray:
    """Reference forward accumulation used by LUM (3_...py:196-199).

    Returns (n, 3, 3) where out[0] = I and out[i] = R_{i-1} @ ... @ R_0.
    """
    xp = _ns(Rs)
    cum = _rev_matmul_scan(Rs)
    eye = xp.eye(3, dtype=cum.dtype)[None]
    return xp.concatenate([eye, cum[:-1]], axis=0)


def absolute_to_relative(T_abs: jnp.ndarray) -> jnp.ndarray:
    """Reference ``poses_absolutas_para_relativas`` (ALL_FUNCTIONS.py:831-837).

    relatives[i] = compose_ref(T_abs[i+1], invert(T_abs[i])), i = 0..n-2.
    """
    return compose_ref(T_abs[1:], invert(T_abs[:-1]))


def absolute_to_relative_circuit(T_abs: jnp.ndarray) -> jnp.ndarray:
    """Implied CIRCUIT relatives of a trajectory, incl. the wraparound edge:
    rel[k] = inv(A_k) @ A_{(k+1)%n}, mapping frame k+1 -> k (the fixture
    files' ``pose_{k+1}_{k}`` convention).  Standard composition — used to
    rank refined stage-3 trajectories against the measured relative poses
    (the intrinsic form of 3_...py:368-400's groundtruth comparison)."""
    xp = _ns(T_abs)
    A_next = xp.concatenate([T_abs[1:], T_abs[:1]])
    return compose(invert(T_abs), A_next)


def loop_closure_error(T_rel: jnp.ndarray) -> jnp.ndarray:
    """Closure pose of the circuit (ALL_FUNCTIONS.py:476-497).

    Accumulates all n relative poses with the reference's convention and returns
    the 4x4 closure pose (identity for a perfect circuit).
    """
    xp = _ns(T_rel)
    Rs, ts = rot(T_rel), trans(T_rel)
    R_cum = _rev_matmul_scan(Rs)
    rotated = xp.einsum("nij,nj->ni", R_cum[:-1], ts[1:])
    t_closure = ts[0] + xp.sum(rotated, axis=0)
    return make_pose(R_cum[-1], t_closure)


def pose_errors(T_a: jnp.ndarray, T_b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``subtract_squared_poses`` (1_...py:17-33).

    Returns (rotation distances, translation distances) per pose:
    d_R = ||R_a - R_b||_F * sqrt(2)/2  (the reference's normalization),
    d_t = ||t_a - t_b||_2.
    """
    d = T_a - T_b
    d_R = jnp.sqrt(jnp.sum(d[..., :3, :3] ** 2, axis=(-2, -1))) / 2.0 * jnp.sqrt(2.0)
    d_t = jnp.linalg.norm(d[..., :3, 3], axis=-1)
    return d_R, d_t


def interpolate(T1: jnp.ndarray, T2: jnp.ndarray, t) -> jnp.ndarray:
    """SLERP on rotations + lerp on translations (``interpolar_duas_T``,
    ALL_FUNCTIONS.py:119-134)."""
    from . import quaternion as quatmod

    t = jnp.asarray(t)
    q1 = quatmod.from_rotation_matrix(rot(T1))
    q2 = quatmod.from_rotation_matrix(rot(T2))
    q = quatmod.slerp(q1, q2, t)
    tr = (1.0 - t)[..., None] * trans(T1) + t[..., None] * trans(T2)
    return make_pose(quatmod.as_rotation_matrix(q), tr)
