"""Band nearest-neighbor search: sort + sweep — the TPU-native pruned NN.

Hash grids prune candidates well but their per-query bucket gathers are
catastrophically slow on TPU (XLA gather ~116 ms vs 36 ms brute force for 18k
points, measured).  The TPU answer keeps memory access CONTIGUOUS:

  1. sort ref points along the axis of largest extent (once);
  2. group queries into tiles of TQ spatially-consecutive points (once — the
     grouping may go stale under the rigid motion of an ICP loop without
     hurting correctness, since band bounds are recomputed from CURRENT
     coordinates every query);
  3. every tile's candidates are ONE contiguous block-quantized slice of the
     sorted refs: [searchsorted(tile_min - r) rounded down to `band`,
     + 2*band) — gathered for all tiles in one op of large contiguous runs;
  4. one batched MXU matmul + argmin does all tiles at once — no per-tile
     dispatch, no Pallas, fully vmappable over scan pairs.

Exactness: guaranteed while every tile's in-radius band fits in 2*band sorted
rows; overflowing slabs lose the farthest candidates only (choose `band` ~
2*r*linear_density + tile span; 2048 covers the shipped datasets at their
search radii with large margin — validated against brute force in tests).

Measured (v5e, NCLT 18k x 18k): one-shot 27-35 ms (sort-bound); amortized
build + per-iteration queries are the GICP win: queries skip all sorts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.0e38)
SENTINEL = 1.0e6


class BandIndex(NamedTuple):
    """Sorted-ref structure + static query grouping (build once per pair)."""

    r_sorted: jnp.ndarray    # (Nr_pad, 3) refs sorted by axis coord (+sentinel pad)
    ra_sorted: jnp.ndarray   # (Nr,) sorted axis coords (unpadded)
    r_order: jnp.ndarray     # (Nr,) sort permutation into original indices
    q_order: jnp.ndarray     # (Nq,) query grouping permutation
    axis: jnp.ndarray        # scalar int — sweep axis


def build_band_index(query, query_mask, ref, ref_mask, *, q_tile: int = 1024,
                     band: int = 2048) -> BandIndex:
    """Sort refs along the largest-extent axis; group queries by it."""
    nq, nr = query.shape[0], ref.shape[0]
    qpts = jnp.where(query_mask[:, None], query, SENTINEL)
    rpts = jnp.where(ref_mask[:, None], ref, SENTINEL)
    big = jnp.float32(3e38)
    rmax = jnp.max(jnp.where(ref_mask[:, None], ref, -big), axis=0)
    rmin = jnp.min(jnp.where(ref_mask[:, None], ref, big), axis=0)
    axis = jnp.argmax(rmax - rmin)
    onehot = (jnp.arange(3) == axis).astype(qpts.dtype)
    qa = qpts @ onehot
    ra = rpts @ onehot
    q_order = jnp.argsort(qa).astype(jnp.int32)
    r_order = jnp.argsort(ra).astype(jnp.int32)
    nr_pad = (-(-nr // band) + 1) * band
    r_sorted = jnp.pad(rpts[r_order], ((0, nr_pad - nr), (0, 0)),
                       constant_values=SENTINEL)
    return BandIndex(r_sorted, ra[r_order], r_order, q_order, axis)


@functools.partial(jax.jit, static_argnames=("q_tile", "band", "backend"))
def nn1_band_query(
    index: BandIndex,
    query: jnp.ndarray,
    query_mask: jnp.ndarray,
    max_dist,
    *,
    q_tile: int = 1024,
    band: int = 2048,
    backend: str = "xla",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest sorted-ref within max_dist per query — NO sorts (uses the
    prebuilt index; query coordinates may have moved since build).

    ``backend='pallas'`` fuses the per-tile distance matrix + argmin in VMEM
    (ops/pallas/nn_kernels.nn1_band_pallas) instead of materializing the
    (Nq, 2*band) f32 matrix in HBM — same slab pruning, ~10x less HBM traffic.

    Returns (exact sqdist, original ref index); out-of-range -> (BIG, 0).
    """
    nq = query.shape[0]
    nr = index.ra_sorted.shape[0]
    nr_pad = index.r_sorted.shape[0]
    max_dist = jnp.float32(max_dist)
    qpts = jnp.where(query_mask[:, None], query, SENTINEL)

    q_s = qpts[index.q_order]                           # (Nq, 3) grouped
    qa_s = jnp.take_along_axis(q_s, jnp.full((nq, 1), index.axis), axis=1)[:, 0]

    nq_pad = -(-nq // q_tile) * q_tile
    q_sp = jnp.pad(q_s, ((0, nq_pad - nq), (0, 0)), constant_values=SENTINEL)
    qa_sp = jnp.pad(qa_s, (0, nq_pad - nq), constant_values=SENTINEL)
    n_tiles = nq_pad // q_tile
    tile_min = jnp.min(qa_sp.reshape(n_tiles, q_tile), axis=1)

    starts = jnp.searchsorted(index.ra_sorted, tile_min - max_dist).astype(jnp.int32)
    max_blk = nr_pad // band - 2
    starts_el = jnp.clip(starts // band, 0, jnp.maximum(max_blk, 0)) * band

    if backend == "pallas":
        from .pallas import nn_kernels

        rT = index.r_sorted.T                           # (3, nr_pad)
        rn = jnp.sum(rT * rT, axis=0)[None, :]          # (1, nr_pad)
        _, idx_win = nn_kernels.nn1_band_pallas(
            (starts_el // band).astype(jnp.int32), q_sp.T, rT, rn,
            q_tile=q_tile, band=band,
        )
        i_sorted = (
            jnp.repeat(starts_el, q_tile, total_repeat_length=nq_pad) + idx_win
        )[:nq]
    else:
        rows = starts_el[:, None] + jnp.arange(2 * band, dtype=jnp.int32)[None, :]
        bands = index.r_sorted[rows]                    # (n_tiles, 2B, 3)
        band_n2 = jnp.sum(bands * bands, axis=-1)

        q_t = q_sp.reshape(n_tiles, q_tile, 3)
        qn = jnp.sum(q_t * q_t, axis=-1)
        cross = jnp.einsum("tqd,tbd->tqb", q_t, bands, preferred_element_type=jnp.float32)
        d2 = qn[..., None] + band_n2[:, None, :] - 2.0 * cross
        best = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        i_sorted = (starts_el[:, None] + best).reshape(nq_pad)[:nq]
    i_sorted = jnp.clip(i_sorted, 0, nr - 1)

    cand = index.r_sorted[i_sorted]
    diff = q_s - cand
    d_exact = jnp.sum(diff * diff, axis=1)
    d_final = jnp.where(d_exact <= max_dist * max_dist, d_exact, BIG)
    ref_idx = index.r_order[i_sorted]
    out_d = jnp.zeros((nq,), jnp.float32).at[index.q_order].set(d_final)
    out_i = jnp.zeros((nq,), jnp.int32).at[index.q_order].set(ref_idx)
    return out_d, out_i


@functools.partial(jax.jit, static_argnames=("q_tile", "band", "backend", "rescore"))
def nn1_band_query_sorted(
    index: BandIndex,
    q_sorted: jnp.ndarray,
    q_sorted_mask: jnp.ndarray,
    max_dist,
    *,
    q_tile: int = 1024,
    band: int = 2048,
    backend: str = "xla",
    rescore: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Band query for callers that LIVE in sorted space: ``q_sorted`` is
    already grouped by ``index.q_order`` and padded to a q_tile multiple.

    Skips the per-call q_order gather and the scatter back to original order
    — the expensive ends of ``nn1_band_query`` — which matters when called
    every iteration of an ICP loop whose reductions are order-invariant.

    Returns (sqdist, SORTED-ref row index), both in sorted query order;
    out-of-range -> (BIG, 0-clipped row).  With ``rescore=False`` the distance
    is the matmul-expansion approximation (~1e-4 abs error) and the 32k-row
    candidate gather is skipped — callers that gather candidate payloads
    anyway recompute the exact distance themselves.
    """
    nq_pad = q_sorted.shape[0]
    nr = index.ra_sorted.shape[0]
    nr_pad = index.r_sorted.shape[0]
    max_dist = jnp.float32(max_dist)
    q_sp = jnp.where(q_sorted_mask[:, None], q_sorted, SENTINEL)
    qa_sp = q_sp @ (jnp.arange(3) == index.axis).astype(q_sp.dtype)
    n_tiles = nq_pad // q_tile
    tile_min = jnp.min(qa_sp.reshape(n_tiles, q_tile), axis=1)

    starts = jnp.searchsorted(index.ra_sorted, tile_min - max_dist).astype(jnp.int32)
    max_blk = nr_pad // band - 2
    starts_el = jnp.clip(starts // band, 0, jnp.maximum(max_blk, 0)) * band

    if backend == "pallas":
        from .pallas import nn_kernels

        rT = index.r_sorted.T
        rn = jnp.sum(rT * rT, axis=0)[None, :]
        d_approx, idx_win = nn_kernels.nn1_band_pallas(
            (starts_el // band).astype(jnp.int32), q_sp.T, rT, rn,
            q_tile=q_tile, band=band,
        )
        i_sorted = jnp.repeat(starts_el, q_tile, total_repeat_length=nq_pad) + idx_win
    else:
        rows = starts_el[:, None] + jnp.arange(2 * band, dtype=jnp.int32)[None, :]
        bands = index.r_sorted[rows]
        band_n2 = jnp.sum(bands * bands, axis=-1)
        q_t = q_sp.reshape(n_tiles, q_tile, 3)
        qn = jnp.sum(q_t * q_t, axis=-1)
        cross = jnp.einsum("tqd,tbd->tqb", q_t, bands, preferred_element_type=jnp.float32)
        d2 = qn[..., None] + band_n2[:, None, :] - 2.0 * cross
        best = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        d_approx = jnp.min(d2, axis=-1).reshape(nq_pad)
        i_sorted = (starts_el[:, None] + best).reshape(nq_pad)
    i_sorted = jnp.clip(i_sorted, 0, nr - 1)
    if not rescore:
        d_final = jnp.where(d_approx <= max_dist * max_dist, d_approx, BIG)
        return d_final, i_sorted
    cand = index.r_sorted[i_sorted]
    diff = q_sp - cand
    d_exact = jnp.sum(diff * diff, axis=1)
    d_final = jnp.where(d_exact <= max_dist * max_dist, d_exact, BIG)
    return d_final, i_sorted


@functools.partial(jax.jit, static_argnames=("q_tile", "band"))
def nn1_band(query, query_mask, ref, ref_mask, max_dist, *,
             q_tile: int = 1024, band: int = 2048):
    """One-shot band NN (build + query)."""
    index = build_band_index(query, query_mask, ref, ref_mask,
                             q_tile=q_tile, band=band)
    return nn1_band_query(index, query, query_mask, max_dist,
                          q_tile=q_tile, band=band)


@functools.partial(jax.jit, static_argnames=("k", "exclude_self", "q_tile",
                                             "band", "recall"))
def knn_self_band(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    *,
    exclude_self: bool = False,
    q_tile: int = 1024,
    band: int = 2048,
    recall: float = 0.99,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors within one cloud via the band sweep.

    Queries ARE the refs (preprocessing neighborhoods: normals, outlier
    removal, FPFH), so one sort serves both sides; each sorted tile's k-NN are
    found with approx_min_k over its 2*band-wide slab, then exactly re-scored.
    Correct while each query's k-th neighbor lies within its tile's band —
    at LiDAR densities the k<=200 neighborhood spans a few hundred sorted
    positions vs a >=band/2 guaranteed margin.

    Output contract matches knn.knn: (sqdists ascending, indices), invalid
    entries >= BIG.
    """
    n = points.shape[0]
    pts = jnp.where(mask[:, None], points, SENTINEL)
    big = jnp.float32(3e38)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    axis = jnp.argmax(pmax - pmin)
    pa = jnp.take_along_axis(pts, jnp.full((n, 1), axis), axis=1)[:, 0]
    order = jnp.argsort(pa).astype(jnp.int32)

    n_pad = -(-n // q_tile) * q_tile
    nr_pad = (-(-n // band) + 1) * band
    p_sorted = pts[order]
    p_q = jnp.pad(p_sorted, ((0, n_pad - n), (0, 0)), constant_values=SENTINEL)
    p_r = jnp.pad(p_sorted, ((0, nr_pad - n), (0, 0)), constant_values=SENTINEL)

    n_tiles = n_pad // q_tile
    # tile t spans sorted rows [t*q_tile, (t+1)*q_tile); center its band
    tile_start_row = jnp.arange(n_tiles, dtype=jnp.int32) * q_tile
    start_blk = jnp.clip((tile_start_row - (2 * band - q_tile) // 2) // band,
                         0, jnp.maximum(nr_pad // band - 2, 0))
    starts_el = start_blk * band

    rows = starts_el[:, None] + jnp.arange(2 * band, dtype=jnp.int32)[None, :]
    bands = p_r[rows]                                   # (T, 2B, 3)
    band_n2 = jnp.sum(bands * bands, axis=-1)

    q_t = p_q.reshape(n_tiles, q_tile, 3)
    qn = jnp.sum(q_t * q_t, axis=-1)
    cross = jnp.einsum("tqd,tbd->tqb", q_t, bands, preferred_element_type=jnp.float32)
    d2 = qn[..., None] + band_n2[:, None, :] - 2.0 * cross
    k_search = k + 1 if exclude_self else k
    _, bi = jax.lax.approx_min_k(d2, k_search, recall_target=recall)  # (T, TQ, ks)
    cand_rows = starts_el[:, None, None] + bi.astype(jnp.int32)
    cand_rows = jnp.minimum(cand_rows, nr_pad - 1)

    # exact re-score in sorted space
    cand = p_r[cand_rows]                               # (T, TQ, ks, 3)
    diff = q_t[:, :, None, :] - cand
    d_exact = jnp.sum(diff * diff, axis=-1)
    d_exact = jnp.where(d_exact >= 1.0e10, BIG, d_exact)  # sentinel candidates
    if exclude_self:
        self_rows = (tile_start_row[:, None] + jnp.arange(q_tile, dtype=jnp.int32)[None, :])
        d_exact = jnp.where(cand_rows == self_rows[:, :, None], BIG, d_exact)
    ord_ = jnp.argsort(d_exact, axis=-1)[..., :k]
    d_sorted = jnp.take_along_axis(d_exact, ord_, axis=-1)
    r_sorted_idx = jnp.take_along_axis(cand_rows, ord_, axis=-1)
    # map sorted rows -> original indices (clip padding)
    orig = order[jnp.clip(r_sorted_idx, 0, n - 1).reshape(-1)].reshape(r_sorted_idx.shape)

    d_flat = d_sorted.reshape(n_pad, k)[:n]
    i_flat = orig.reshape(n_pad, k)[:n]
    out_d = jnp.zeros((n, k), jnp.float32).at[order].set(d_flat)
    out_i = jnp.zeros((n, k), jnp.int32).at[order].set(i_flat)
    return out_d, out_i
