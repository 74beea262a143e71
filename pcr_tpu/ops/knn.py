"""Tiled brute-force k-nearest-neighbor search — the core kernel (SURVEY N5).

TPU-native replacement for Open3D's KD-tree/FLANN searches (implicit in the
reference's ``estimate_normals``, ``remove_statistical_outlier``,
``compute_fpfh_feature``, GICP correspondence search, ...).  Trees are a poor
fit for the MXU; instead distances are computed tile-by-tile as a matmul
(‖q−r‖² = ‖q‖² + ‖r‖² − 2 q·rᵀ) and reduced with a running top-k merge, so the
FLOPs land on the systolic array and memory stays bounded at
(q_tile × r_chunk).

All results are exact squared distances: after the matmul-metric search the
selected candidates are re-scored with the exact elementwise formula (the
matmul form loses ~1e-4 m² to cancellation at LiDAR scales, enough to matter
for outlier statistics but not for candidate selection, so we select with the
fast metric and score with the exact one).

Shapes are static; invalid (padding) points never win because they sit at the
``PAD_COORD`` sentinel and are additionally masked to +inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.0e38)
# Any exact squared distance above this is a sentinel (PAD_COORD) hit: real
# LiDAR scenes are < ~2 km across (d^2 < 4e6) while sentinel pairs are ~1e12.
SENTINEL_D2 = 1.0e10
PAD_COORD = 1.0e6


def _default_method() -> str:
    """TPU: approx_min_k (hardware PartialReduce; see knn_approx's recall
    notes for the measured cost/recall trade); elsewhere: exact merge."""
    return "approx" if jax.default_backend() == "tpu" else "exact"


def _pad_rows(x: jnp.ndarray, to: int, value) -> jnp.ndarray:
    n = x.shape[0]
    if n == to:
        return x
    pad = [(0, to - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=value)


def _chunk_sqdist(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(Tq, D) x (C, D) -> (Tq, C) squared distances via MXU matmul."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    rn = jnp.sum(r * r, axis=-1)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
    return jnp.maximum(qn + rn[None, :] - 2.0 * cross, 0.0)


def exact_sqdist(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    d = q - r
    return jnp.sum(d * d, axis=-1)


def knn(query, ref, ref_mask, k, *, exclude_self=False, method="auto", **kw):
    """k-NN dispatch. See ``knn_exact`` for the output contract.

    method='band' (TPU default for self-queries): one sort + approx_min_k
    over narrow sorted bands; 'approx': approx_min_k over full distance rows;
    'exact': the tiled merge (CPU default).
    """
    if method == "auto":
        # band self-kNN measured slower than approx_min_k at k>=30 (row-count
        # dominated) and ~0.89 recall at default settings; approx wins.
        method = "approx" if jax.default_backend() == "tpu" else "exact"
    if method == "band":
        if query is not ref:
            raise ValueError("band kNN requires query is ref (self-neighborhoods)")
        from . import band_nn

        kw.pop("r_chunk", None)
        return band_nn.knn_self_band(query, ref_mask, k, exclude_self=exclude_self, **kw)
    if method == "approx":
        kw.pop("r_chunk", None)
        return knn_approx(query, ref, ref_mask, k, exclude_self=exclude_self, **kw)
    # knn_exact is already exact: the approx-only tuning knobs are no-ops.
    kw.pop("recall", None)
    kw.pop("rescore", None)
    return knn_exact(query, ref, ref_mask, k, exclude_self=exclude_self, **kw)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "q_tile", "recall", "rescore")
)
def knn_approx(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    k: int,
    *,
    exclude_self: bool = False,
    q_tile: int = 2048,
    recall: float = 0.95,
    rescore: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN via the TPU-native approx_min_k PartialReduce over full distance
    rows, followed (by default) by exact re-scoring of the selected candidates.

    Output contract matches ``knn_exact``: (sqdists ascending, indices), with
    missing/invalid entries at >= BIG.

    ``recall`` — PartialReduce per-neighbor recall target.  Its cost is wildly
    nonlinear in the last percent: at k=200 over a 32k cloud the selection
    costs 1.09 s at 0.99 but 0.12 s at 0.95 and 0.07 s at 0.90 (measured on
    v5e; the reduction width approx_min_k needs blows up as recall→1).  0.95
    is the default.  NOTE the target is calibrated for uniform data — on real
    clustered LiDAR the measured true recall at target 0.95 is ~0.88
    (k=200, NCLT scan).  That miss rate still perturbs aggregate statistics
    (normal covariances, FPFH histograms, outlier means) far below their own
    noise floor: FPFH median relative error vs exact kNN is 0.09% and the
    NCLT FGR golden pair is unchanged (validated end-to-end).

    ``rescore=False`` skips the exact-rescore gather (~0.2 s at k=200/32k) and
    returns the matmul-metric distances, clamped to >= 0.  Those carry a
    cancellation error of ~1e-3 m^2 at LiDAR coordinate scales — fine for
    radius gates and 1/d^2 weights; use the default when exact distances or a
    strict ascending order contract matter.
    """
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // q_tile) * q_tile
    qp = _pad_rows(query, nq_pad, 0.0)
    rp = jnp.where(ref_mask[:, None], ref, PAD_COORD)  # sentinel discipline
    rn = jnp.sum(rp * rp, axis=1)

    k_search = k + 1 if exclude_self else k
    q_tiles = qp.reshape(nq_pad // q_tile, q_tile, -1)
    qidx_tiles = jnp.arange(nq_pad, dtype=jnp.int32).reshape(nq_pad // q_tile, q_tile)

    def per_tile(tile):
        q, qidx = tile
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        cross = jnp.dot(q, rp.T, preferred_element_type=jnp.float32)
        d2 = qn + rn[None, :] - 2.0 * cross
        dd, ii = jax.lax.approx_min_k(d2, k_search, recall_target=recall)
        ii = ii.astype(jnp.int32)
        if not rescore:
            dd = jnp.where(dd >= SENTINEL_D2, BIG, jnp.maximum(dd, 0.0))
            if exclude_self:
                # Push the self hit (if found) to the end, keep k of k+1.
                dd = jnp.where(ii == qidx[:, None], BIG, dd)
                neg, pos = jax.lax.top_k(-dd, k)
                return -neg, jnp.take_along_axis(ii, pos, axis=1)
            return dd, ii
        # exact re-score of candidates
        cand = rp[ii]
        d_exact = exact_sqdist(q[:, None, :], cand)
        d_exact = jnp.where(d_exact >= SENTINEL_D2, BIG, d_exact)
        if exclude_self:
            d_exact = jnp.where(ii == qidx[:, None], BIG, d_exact)
        order = jnp.argsort(d_exact, axis=1)[:, :k]
        return (
            jnp.take_along_axis(d_exact, order, axis=1),
            jnp.take_along_axis(ii, order, axis=1),
        )

    d, i = jax.lax.map(per_tile, (q_tiles, qidx_tiles))
    return d.reshape(nq_pad, k)[:nq], i.reshape(nq_pad, k)[:nq]


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "q_tile", "r_chunk")
)
def knn_exact(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    k: int,
    *,
    exclude_self: bool = False,
    q_tile: int = 512,
    r_chunk: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN of `query` (Nq, D) in `ref` (Nr, D) for any feature dim D
    (D=3 for points, D=33 for FPFH feature matching in FGR).

    Returns (sqdists (Nq, k) ascending, indices (Nq, k) int32). Entries beyond
    the number of valid reference points get sqdist >= BIG and index of the
    best-effort candidate; callers gate on distance/mask.

    ``exclude_self=True`` removes the i==j pair (for within-cloud queries where
    query IS ref, e.g. outlier removal / FPFH neighborhoods).
    """
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // q_tile) * q_tile
    nr_pad = -(-nr // r_chunk) * r_chunk
    qp = _pad_rows(query, nq_pad, 0.0)
    rp = _pad_rows(ref, nr_pad, 0.0)
    rmask = _pad_rows(ref_mask, nr_pad, False)

    dim = query.shape[1]
    r_chunks = rp.reshape(nr_pad // r_chunk, r_chunk, dim)
    m_chunks = rmask.reshape(nr_pad // r_chunk, r_chunk)
    q_tiles = qp.reshape(nq_pad // q_tile, q_tile, dim)
    qidx_tiles = jnp.arange(nq_pad, dtype=jnp.int32).reshape(nq_pad // q_tile, q_tile)

    def per_tile(tile):
        q, qidx = tile

        def scan_chunk(carry, inp):
            best_d, best_i = carry
            rc, mc, chunk_id = inp
            d2 = _chunk_sqdist(q, rc)
            d2 = jnp.where(mc[None, :], d2, BIG)
            col = chunk_id * r_chunk + jnp.arange(r_chunk, dtype=jnp.int32)
            if exclude_self:
                d2 = jnp.where(col[None, :] == qidx[:, None], BIG, d2)
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate([best_i, jnp.broadcast_to(col[None, :], d2.shape)], axis=1)
            neg_top, pos = jax.lax.top_k(-cat_d, k)
            return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None

        init = (
            jnp.full((q_tile, k), BIG, dtype=jnp.float32),
            jnp.zeros((q_tile, k), dtype=jnp.int32),
        )
        chunk_ids = jnp.arange(nr_pad // r_chunk, dtype=jnp.int32)
        (best_d, best_i), _ = jax.lax.scan(scan_chunk, init, (r_chunks, m_chunks, chunk_ids))
        # Exact re-score + re-sort of the k winners
        cand = rp[best_i]  # (q_tile, k, dim)
        d_exact = exact_sqdist(q[:, None, :], cand)
        d_exact = jnp.where(best_d >= BIG, BIG, d_exact)
        order = jnp.argsort(d_exact, axis=1)
        return (
            jnp.take_along_axis(d_exact, order, axis=1),
            jnp.take_along_axis(best_i, order, axis=1),
        )

    d, i = jax.lax.map(per_tile, (q_tiles, qidx_tiles))
    d = d.reshape(nq_pad, k)[:nq]
    i = i.reshape(nq_pad, k)[:nq]
    return d, i


def nn1(query, ref, ref_mask, *, method="auto", **kw):
    """Nearest neighbor (k=1) — the GICP hot path.

    Dispatches to the Pallas VMEM-resident kernel on TPU and the tiled XLA
    merge elsewhere. Returns (exact sqdist (Nq,), index (Nq,) int32).
    """
    if method == "auto":
        # The band/grid accelerators in models.gicp cover the hot loop; the
        # Pallas brute kernel is opt-in (it matches XLA speed at these sizes
        # and has shown backend errors when nested under while_loop).
        method = "exact"
    if method == "pallas":
        from .pallas import nn_kernels

        rp = jnp.where(ref_mask[:, None], ref, PAD_COORD)
        d, i = nn_kernels.nn1_pallas(query, rp)
        return jnp.where(d >= SENTINEL_D2, BIG, d), i
    return nn1_exact(query, ref, ref_mask, **kw)


@functools.partial(jax.jit, static_argnames=("q_tile", "r_chunk"))
def nn1_exact(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    *,
    q_tile: int = 1024,
    r_chunk: int = 8192,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled-merge nearest neighbor (k=1), exact, any backend."""
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // q_tile) * q_tile
    nr_pad = -(-nr // r_chunk) * r_chunk
    qp = _pad_rows(query, nq_pad, 0.0)
    rp = _pad_rows(ref, nr_pad, 0.0)
    rmask = _pad_rows(ref_mask, nr_pad, False)

    dim = query.shape[1]
    r_chunks = rp.reshape(nr_pad // r_chunk, r_chunk, dim)
    m_chunks = rmask.reshape(nr_pad // r_chunk, r_chunk)
    q_tiles = qp.reshape(nq_pad // q_tile, q_tile, dim)

    def per_tile(q):
        def scan_chunk(carry, inp):
            best_d, best_i = carry
            rc, mc, chunk_id = inp
            d2 = _chunk_sqdist(q, rc)
            d2 = jnp.where(mc[None, :], d2, BIG)
            cd = jnp.min(d2, axis=1)
            ci = chunk_id * r_chunk + jnp.argmin(d2, axis=1).astype(jnp.int32)
            take = cd < best_d
            return (jnp.where(take, cd, best_d), jnp.where(take, ci, best_i)), None

        init = (jnp.full((q_tile,), BIG, jnp.float32), jnp.zeros((q_tile,), jnp.int32))
        chunk_ids = jnp.arange(nr_pad // r_chunk, dtype=jnp.int32)
        (best_d, best_i), _ = jax.lax.scan(scan_chunk, init, (r_chunks, m_chunks, chunk_ids))
        d_exact = exact_sqdist(q, rp[best_i])
        return jnp.where(best_d >= BIG, BIG, d_exact), best_i

    d, i = jax.lax.map(per_tile, q_tiles)
    return d.reshape(nq_pad)[:nq], i.reshape(nq_pad)[:nq]


@functools.partial(jax.jit, static_argnames=("q_tile",))
def nn1_mutual(
    a: jnp.ndarray,
    a_mask: jnp.ndarray,
    b: jnp.ndarray,
    b_mask: jnp.ndarray,
    *,
    q_tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Simultaneous a->b and b->a exact nearest-neighbor indices in ONE pass
    over the distance tiles (the FGR mutual-matching hot path,
    models/fgr.py:match_features).

    Two separate ``nn1`` calls each pay a full O(Na*Nb) distance sweep; here
    every (q_tile, Nb) tile updates the row argmin (a->b) and a carried
    column argmin (b->a) before being discarded, halving the HBM/VPU work.

    Returns (ij (Na,) int32, ji (Nb,) int32); rows with no valid partner
    (masked query, or empty other side) get index 0 — callers must gate on
    their own masks, exactly as with ``nn1``.
    """
    na, nb = a.shape[0], b.shape[0]
    na_pad = -(-na // q_tile) * q_tile
    ap = _pad_rows(a, na_pad, 0.0)
    amask = _pad_rows(a_mask, na_pad, False)
    a_tiles = ap.reshape(na_pad // q_tile, q_tile, a.shape[1])
    am_tiles = amask.reshape(na_pad // q_tile, q_tile)
    tile_ids = jnp.arange(na_pad // q_tile, dtype=jnp.int32)

    def scan_tile(carry, inp):
        col_d, col_i = carry
        q, qm, tid = inp
        d2 = _chunk_sqdist(q, b)                     # (q_tile, Nb)
        d2 = jnp.where(qm[:, None] & b_mask[None, :], d2, BIG)
        row_i = (jnp.argmin(d2, axis=1)).astype(jnp.int32)
        cmin = jnp.min(d2, axis=0)                   # (Nb,)
        carg = tid * q_tile + jnp.argmin(d2, axis=0).astype(jnp.int32)
        take = cmin < col_d
        return (
            (jnp.where(take, cmin, col_d), jnp.where(take, carg, col_i)),
            row_i,
        )

    init = (jnp.full((nb,), BIG, jnp.float32), jnp.zeros((nb,), jnp.int32))
    (_, ji), ij = jax.lax.scan(scan_tile, init, (a_tiles, am_tiles, tile_ids))
    return ij.reshape(na_pad)[:na], ji


def hybrid(query, ref, ref_mask, k: int, radius: float, **kw):
    """KDTreeSearchParamHybrid semantics (1_...py:44-48): k nearest within
    `radius`; neighbors beyond the radius are flagged invalid.

    Returns (sqdists, indices, valid_mask) each (Nq, k).
    """
    d, i = knn(query, ref, ref_mask, k, **kw)
    valid = d <= jnp.float32(radius) ** 2
    return d, i, valid
