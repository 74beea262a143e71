"""Fast Global Registration (SURVEY N14) — feature matching, tuple test, and
graduated non-convexity, all fixed-shape and seeded.

Replaces ``o3d.pipelines.registration.registration_fgr_based_on_feature_matching``
with the options of ``1_FGR_pairwise_registration...py:52-59``:
division_factor=1.4, use_absolute_scale False/True, decrease_mu=True,
maximum_correspondence_distance=2*voxel, iteration_number=300,
tuple_scale=0.95, maximum_tuple_count=0.2*n.

Stages (Zhou, Park & Koltun's algorithm, re-derived for static shapes):
  1. Mutual nearest-neighbor matching over 33-dim FPFH features
     (matmul-tiled k-NN — the same MXU kernel as point search).
  2. Tuple test: seeded random triples of correspondences; a triple is kept
     when all three point-pair length ratios lie in
     [tuple_scale, 1/tuple_scale]; accepted tuples are capped at
     maximum_tuple_count.  The reference's version is rand()-seeded and
     nondeterministic (SURVEY §7 "hard parts"); ours is deterministic given
     `seed` — validated by downstream fitness/ATE rather than pose equality.
  3. Graduated non-convexity on scaled Geman-McClure: line-process weight
     l = (mu / (mu + ||r||^2))^2, mu halved by division_factor every 4
     iterations until it reaches max_corr_dist^2; each iteration takes one
     weighted point-to-point Gauss-Newton step on se(3).

With use_absolute_scale=False both clouds are centered and divided by the
global max-radius before optimization (and the result denormalized), matching
Open3D's NormalizePointClouds.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fpfh as fpfh_ops
from ..ops import knn as knn_ops
from ..ops import normals as normals_ops
from ..utils import se3
from ..utils.cloud import Cloud
from .gicp import RegistrationResult
from . import evaluate as eval_mod


class FgrOptions(NamedTuple):
    division_factor: float = 1.4
    use_absolute_scale: bool = False
    decrease_mu: bool = True
    maximum_correspondence_distance: float = 0.2
    iteration_number: int = 300
    tuple_scale: float = 0.95
    maximum_tuple_count: int = 1000
    tuple_test: bool = True


def match_features(feat_src, src_mask, feat_tgt, tgt_mask):
    """Mutual nearest neighbors in feature space.

    Returns (corr_src_idx (N,), corr_tgt_idx (N,), corr_mask (N,)) where N is
    the source capacity — pair i is (i, nn_tgt[i]) kept when mutual.
    """
    # One fused pass computes both argmin directions (see knn.nn1_mutual) —
    # two nn1 calls over 33-dim features were the FGR per-pair bottleneck.
    ij, ji = knn_ops.nn1_mutual(feat_src, src_mask, feat_tgt, tgt_mask)
    n = feat_src.shape[0]
    mutual = ji[ij] == jnp.arange(n, dtype=jnp.int32)
    return jnp.arange(n, dtype=jnp.int32), ij, mutual & src_mask


def tuple_test(
    pts_src, pts_tgt, corr_i, corr_j, corr_mask, seed,
    tuple_scale: float = 0.95, max_tuples: int = 4096, n_trials: int = 16384,
):
    """Seeded, fixed-shape tuple constraint.

    Samples n_trials random correspondence triples from the valid set, accepts
    a triple when all three length ratios |p_a - p_b| / |q_a - q_b| are within
    [tuple_scale, 1/tuple_scale], caps acceptance at max_tuples, and returns a
    per-correspondence keep-mask (a correspondence survives if it appears in
    any accepted tuple).
    """
    n = corr_i.shape[0]
    # Compact valid correspondence slots to a prefix for uniform sampling
    order = jnp.argsort(~corr_mask, stable=True)
    n_valid = jnp.sum(corr_mask.astype(jnp.int32))
    key = jax.random.PRNGKey(seed)
    # sample slot positions in [0, n_valid)
    u = jax.random.uniform(key, (n_trials, 3))
    pos = jnp.minimum((u * n_valid).astype(jnp.int32), jnp.maximum(n_valid - 1, 0))
    slots = order[pos]                                     # (n_trials, 3)
    pa = pts_src[corr_i[slots]]                            # (n_trials, 3, 3)
    qa = pts_tgt[corr_j[slots]]

    def edge_ratio(a, b):
        dp = jnp.linalg.norm(pa[:, a] - pa[:, b], axis=-1)
        dq = jnp.linalg.norm(qa[:, a] - qa[:, b], axis=-1)
        r = dp / jnp.maximum(dq, 1e-12)
        return (r > tuple_scale) & (r < 1.0 / tuple_scale)

    ok = edge_ratio(0, 1) & edge_ratio(1, 2) & edge_ratio(2, 0)
    ok = ok & (n_valid >= 3)
    # cap accepted tuples at max_tuples (first-come order, like the reference)
    accepted_before = jnp.cumsum(ok.astype(jnp.int32)) - ok.astype(jnp.int32)
    ok = ok & (accepted_before < max_tuples)
    # scatter: mark correspondences present in accepted tuples
    flat = slots.reshape(-1)
    flat_ok = jnp.repeat(ok, 3)
    keep = jnp.zeros((n,), dtype=jnp.bool_).at[flat].max(flat_ok)
    return keep & corr_mask


@functools.partial(jax.jit, static_argnames=("opts",))
def fgr_from_correspondences(
    source: Cloud, target: Cloud, corr_i, corr_j, corr_mask, opts: FgrOptions
) -> jnp.ndarray:
    """GNC optimization over fixed correspondences; returns the 4x4 pose."""
    p_all = source.points[corr_i]
    q_all = target.points[corr_j]
    w_corr = corr_mask.astype(jnp.float32)

    if opts.use_absolute_scale:
        scale = jnp.float32(1.0)
        c_src = jnp.zeros(3, jnp.float32)
        c_tgt = jnp.zeros(3, jnp.float32)
    else:
        def center_radius(pts, mask):
            w = mask.astype(jnp.float32)[:, None]
            c = jnp.sum(pts * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
            r = jnp.max(jnp.where(mask, jnp.linalg.norm(pts - c, axis=-1), 0.0))
            return c, r

        c_src, r_src = center_radius(source.points, source.mask)
        c_tgt, r_tgt = center_radius(target.points, target.mask)
        scale = jnp.maximum(jnp.maximum(r_src, r_tgt), 1e-6)

    p = (p_all - c_src) / scale
    q = (q_all - c_tgt) / scale
    delta = opts.maximum_correspondence_distance / scale  # normalized stop scale

    def body(carry, it):
        T, mu = carry
        if opts.decrease_mu:
            decrease = (it % 4 == 0) & (mu > delta * delta)
            mu = jnp.where(decrease, mu / opts.division_factor, mu)
        pt = se3.transform_points(T, p)
        r = q - pt
        r2 = jnp.sum(r * r, axis=-1)
        l = jnp.square(mu / (mu + r2)) * w_corr
        G = jnp.concatenate(
            [se3.skew(pt), jnp.broadcast_to(-jnp.eye(3, dtype=pt.dtype), pt.shape + (3,))],
            axis=-1,
        )
        H = jnp.einsum("nij,nik,n->jk", G, G, l)
        g = jnp.einsum("nij,ni,n->j", G, r, l)
        lam = 1e-6 * (jnp.trace(H) / 6.0 + 1.0)
        xi = -jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), g)
        xi = jnp.where(jnp.sum(w_corr) >= 3, xi, 0.0)
        return (se3.compose(se3.se3_exp(xi), T), mu), None

    # mu starts at the (normalized) global scale squared = 1.0 for relative
    # scale mode; for absolute scale use the squared max pairwise extent proxy.
    mu0 = jnp.float32(1.0) if not opts.use_absolute_scale else jnp.float32(
        opts.maximum_correspondence_distance
    ) ** 2 * jnp.float32(1e4)
    (T_hat, _), _ = jax.lax.scan(
        body, (jnp.eye(4, dtype=jnp.float32), mu0), jnp.arange(opts.iteration_number)
    )
    # Denormalize: q = s*(R p_hat + t_hat) + c_tgt with p_hat = (p - c_src)/s
    R = se3.rot(T_hat)
    t = scale * se3.trans(T_hat) + c_tgt - R @ c_src
    return se3.make_pose(R, t)


@functools.partial(jax.jit, static_argnames=("opts", "n_trials"))
def registration_fgr(
    source: Cloud,
    target: Cloud,
    feat_src,
    feat_tgt,
    opts: FgrOptions,
    seed: int = 0,
    n_trials: int = 16384,
    max_tuples=None,
) -> RegistrationResult:
    """Full FGR: mutual matching -> tuple test -> GNC -> evaluation.

    One jit end-to-end: the eager tuple-test/matching glue used to cost ~20
    small dispatches per pair — real latency through the remote-TPU tunnel in
    the 901-pair circuit loop.

    ``max_tuples`` optionally overrides ``opts.maximum_tuple_count`` with a
    TRACED per-call value (the cap is a dynamic comparison, not a shape), so
    batched runners can give every pair of a chunk its own reference-equal
    ``0.2 * n`` count (1_...py:59) without per-pair recompilation."""
    corr_i, corr_j, corr_mask = match_features(feat_src, source.mask, feat_tgt, target.mask)
    if opts.tuple_test:
        corr_mask = tuple_test(
            source.points, target.points, corr_i, corr_j, corr_mask, seed,
            tuple_scale=opts.tuple_scale,
            max_tuples=(opts.maximum_tuple_count if max_tuples is None
                        else max_tuples),
            n_trials=n_trials,
        )
    T = fgr_from_correspondences(source, target, corr_i, corr_j, corr_mask, opts)
    fitness, rmse, n_corr = eval_mod.evaluate_registration(
        source, target, opts.maximum_correspondence_distance, T
    )
    return RegistrationResult(T, fitness, rmse, n_corr, jnp.int32(opts.iteration_number))


@jax.jit
def fgr_features(c: Cloud, voxel_size) -> tuple[Cloud, jnp.ndarray]:
    """Per-cloud FGR preprocessing: hybrid normals (2v, 20) + FPFH (10v, 200)
    (1_...py:44-50).  Split out so circuit runners compute each cloud's
    features ONCE — every scan serves two adjacent pairs (pipeline stage 1),
    halving the dominant FPFH cost of the reference's per-pair loop.

    One jit: a single k=200 selection serves both consumers (its first 19
    columns plus the query itself are the hybrid(2v, 20) normal neighborhood,
    the full 200 the FPFH neighborhood), and the whole chain compiles as one
    executable — the selection is the dominant cost, everything downstream
    fuses around it."""
    # recall 0.90: the selection costs 119 ms vs 168 ms at 0.95 (v5e, 32k
    # bucket) and its misses are tail-rank — the FPFH pass-2 matmul re-admits
    # every true neighbor within tau anyway, and the normals slice uses only
    # the top-19 ranks where recall stays high.  Validated on TPU against the
    # NCLT FGR fixtures (see BENCHMARKS.md).
    d2, idx = knn_ops.knn(
        c.points, c.points, c.mask, 200, exclude_self=True, rescore=False,
        recall=0.90,
    )
    normals, cov = normals_ops.estimate_normals_hybrid_from_knn(
        c.points, c.mask, d2, idx, 2 * voxel_size, 20
    )
    c = c.with_(normals=normals, covariances=cov)
    feat = fpfh_ops.fpfh(
        c.points, c.normals, c.mask, 10 * voxel_size, 200, knn_result=(d2, idx)
    )
    return c, feat


@functools.partial(jax.jit, static_argnames=("opts", "n_trials"))
def batched_registration_fgr(
    source: Cloud,
    target: Cloud,
    feat_src,
    feat_tgt,
    opts: FgrOptions,
    seeds,
    n_trials: int = 16384,
    max_tuples=None,
) -> RegistrationResult:
    """vmapped FGR over stacked pairs (leading dim B) — the pair-parallel
    form of the reference's serial stage-1 loop (1_...py:134-147).  ``seeds``
    is an (B,) int array, one tuple-test seed per pair (matching the serial
    runner's per-pair ``fgr_seed + src_index`` so batched == serial);
    ``max_tuples`` an optional (B,) int array of per-pair tuple-count caps
    (the serial runner's per-pair-bucket ``0.2 * capacity`` options)."""
    if max_tuples is None:
        def one(s, t, fs, ft, sd):
            return registration_fgr(s, t, fs, ft, opts, sd, n_trials)

        return jax.vmap(one)(source, target, feat_src, feat_tgt,
                             jnp.asarray(seeds))

    def one_mt(s, t, fs, ft, sd, mt):
        return registration_fgr(s, t, fs, ft, opts, sd, n_trials, mt)

    return jax.vmap(one_mt)(source, target, feat_src, feat_tgt,
                            jnp.asarray(seeds), jnp.asarray(max_tuples))


@functools.partial(jax.jit, static_argnames=())
def batched_fgr_features(clouds: Cloud, voxel_size) -> tuple[Cloud, jnp.ndarray]:
    """vmapped ``fgr_features`` over stacked scans (leading dim B).  Circuit
    runners stack the B+1 scans a B-pair chunk touches, featurize each scan
    once, and slice src/tgt views — keeping stage 1's once-per-scan FPFH
    economy while filling the chip with a batch."""
    return jax.vmap(fgr_features, in_axes=(0, None))(clouds, voxel_size)


def default_options(
    source: Cloud, target: Cloud, voxel_size: float,
    use_absolute_scale: bool = False,
) -> FgrOptions:
    """The script-1 option set (1_...py:52-59)."""
    n_pts = (int(source.capacity) + int(target.capacity)) // 2  # static proxy
    return default_options_capacity(n_pts, voxel_size, use_absolute_scale)


def default_options_capacity(
    n_pts: int, voxel_size: float, use_absolute_scale: bool = False,
) -> FgrOptions:
    """``default_options`` from a capacity alone — for callers that know the
    pair bucket before building the padded clouds (pipeline._pair_step pads
    INSIDE its fused jit, so the host side only has the bucket int)."""
    return FgrOptions(
        use_absolute_scale=use_absolute_scale,
        maximum_correspondence_distance=2 * voxel_size,
        iteration_number=300,
        maximum_tuple_count=max(int(0.2 * n_pts), 256),
    )


def registro_fgr(
    source: Cloud, target: Cloud, voxel_size: float,
    use_absolute_scale: bool = False, seed: int = 0,
) -> RegistrationResult:
    """The reference's ``registro_FGR`` pipeline (1_...py:41-66): hybrid
    normals (2v, 20) -> FPFH (10v, 200) -> FGR.

    use_absolute_scale defaults to the script-1 value (False); the
    ALL_FUNCTIONS.py:191 variant uses True.
    """
    src, feat_src = fgr_features(source, voxel_size)
    tgt, feat_tgt = fgr_features(target, voxel_size)
    opts = default_options(src, tgt, voxel_size, use_absolute_scale)
    return registration_fgr(src, tgt, feat_src, feat_tgt, opts, seed=seed)
