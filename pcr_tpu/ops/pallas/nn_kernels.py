"""Pallas TPU kernels for nearest-neighbor search — the speed-of-light path.

The XLA formulation in ``ops.knn`` is correct everywhere but dispatch-bound on
TPU: lax.map over query tiles x lax.scan over ref chunks = O(100) sequential
launches per call, each microseconds of real work.  Here the whole search is
ONE kernel: the reference cloud lives in VMEM, the grid walks query tiles, and
a lane-structured running min over ref chunks does the reduction without ever
materializing a distance matrix in HBM.

Layout: point arrays enter the kernel TRANSPOSED as (3, N).  A (N, 3) block
would be lane-padded to (N, 128) in VMEM (42x waste — a 32k-point cloud
becomes 16 MB and blows the VMEM budget); as (3, N) only the sublane dim pads
(3 -> 8) and the same cloud is 1 MB.

Reduction: the chunk loop is pure elementwise min/select on the (TQ, RC) lane
grid — per-chunk cross-lane argmin would serialize on the VPU; instead each
lane tracks its own best chunk id and a single cross-lane argmin runs once at
the end (winner index = best_chunk * RC + lane).

Masking contract: padding/removed points are parked at the PAD_COORD sentinel
(1e6), so their distances to any real point are ~1e12 and they never win; the
kernel therefore needs no mask input (see utils.cloud).  Selected distances
are re-scored exactly outside the kernel (cheap gather) to remove the
matmul-expansion cancellation error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = jnp.float32(3.0e38)


def _nn1_kernel(q_ref, r_ref, rn_ref, d_ref, i_ref, best_d_ref, best_c_ref,
                *, sub_chunk: int):
    """Grid = (query_tiles, ref_chunks); the chunk axis is innermost so the
    VMEM scratch (best_d/best_c) carries the running per-lane min across chunk
    steps while the BlockSpec pipeline streams ref chunks through VMEM.

    Each grid step DMAs a large ref block but processes it in statically
    unrolled ``sub_chunk`` slices: temporaries stay at (TQ, sub_chunk) — the
    VMEM ceiling — while the grid-step count (and its per-step overhead)
    shrinks by the block/sub ratio.
    """
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    q = q_ref[:]                                        # (3, TQ)
    qn = jnp.sum(q * q, axis=0)                         # (TQ,)
    tq = q.shape[1]
    r_block = r_ref.shape[1]
    n_sub = r_block // sub_chunk

    @pl.when(c == 0)
    def _():
        best_d_ref[:, :] = jnp.full_like(best_d_ref, 3.0e38)
        best_c_ref[:, :] = jnp.zeros_like(best_c_ref)

    for s in range(n_sub):                              # static unroll
        r = r_ref[:, s * sub_chunk : (s + 1) * sub_chunk]    # (3, SC)
        rn = rn_ref[0, s * sub_chunk : (s + 1) * sub_chunk]  # (SC,)
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (TQ, SC)
        d2 = qn[:, None] + rn[None, :] - 2.0 * cross
        take = d2 < best_d_ref[:, :]
        best_d_ref[:, :] = jnp.where(take, d2, best_d_ref[:, :])
        best_c_ref[:, :] = jnp.where(take, c * n_sub + s, best_c_ref[:, :])

    @pl.when(c == n_chunks - 1)
    def _():
        best_d = best_d_ref[:, :]
        best_c = best_c_ref[:, :]
        lane = jnp.argmin(best_d, axis=1).astype(jnp.int32)        # (TQ,)
        d_min = jnp.min(best_d, axis=1)
        # Winning lane's sub-chunk id via one-hot reduce (Mosaic has no
        # gather): c_win[t] = best_c[t, lane[t]].
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, best_d.shape, 1)
        onehot = (lane_iota == lane[:, None]).astype(jnp.int32)
        c_win = jnp.sum(best_c * onehot, axis=1)
        idx = c_win * sub_chunk + lane
        d_ref[:, :] = d_min.reshape(tq // 128, 128)
        i_ref[:, :] = idx.reshape(tq // 128, 128)


@functools.partial(jax.jit, static_argnames=("q_tile", "band", "sub_chunk"))
def nn1_band_pallas(
    starts_blk: jnp.ndarray,
    qT_sorted: jnp.ndarray,
    rT_sorted: jnp.ndarray,
    rn_sorted: jnp.ndarray,
    *,
    q_tile: int = 1024,
    band: int = 2048,
    sub_chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Banded nearest-neighbor: each query tile only scans its own contiguous
    2*band-wide slab of the sorted reference (the ``ops.band_nn`` pruning),
    with the distance matrix and argmin fused in VMEM — the XLA band path
    materializes (Nq, 2*band) f32 in HBM every ICP iteration (512 MB at 32k
    points), which made correspondence search HBM-bound.

    starts_blk: (n_tiles,) int32 — per-tile slab start in units of ``band``
      (scalar-prefetched so the BlockSpec index map can steer the ref DMA).
    qT_sorted:  (3, n_tiles*q_tile) grouped queries (band_nn.q_order applied).
    rT_sorted:  (3, nr_pad) sorted refs, SENTINEL-padded.
    rn_sorted:  (1, nr_pad) their squared norms.

    Returns (approx sqdist (Nq,), WINDOW-RELATIVE winner row (Nq,) int32);
    callers add ``starts_blk*band`` back and re-score exactly.
    """
    nq_pad = qT_sorted.shape[1]
    n_tiles = nq_pad // q_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda g, c, s: (0, g)),
            pl.BlockSpec((3, band), lambda g, c, s: (0, s[g] + c)),
            pl.BlockSpec((1, band), lambda g, c, s: (0, s[g] + c)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile // 128, 128), lambda g, c, s: (g, 0)),
            pl.BlockSpec((q_tile // 128, 128), lambda g, c, s: (g, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, sub_chunk), jnp.float32),
            pltpu.VMEM((q_tile, sub_chunk), jnp.int32),
        ],
    )
    d, i = pl.pallas_call(
        functools.partial(_nn1_band_kernel, sub_chunk=sub_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad // 128, 128), jnp.int32),
        ],
    )(starts_blk, qT_sorted, rT_sorted, rn_sorted)
    return d.reshape(nq_pad), i.reshape(nq_pad)


def _nn1_band_kernel(s_ref, q_ref, r_ref, rn_ref, d_ref, i_ref,
                     best_d_ref, best_c_ref, *, sub_chunk: int):
    """Same running-min reduction as ``_nn1_kernel`` but over exactly two
    band-wide ref blocks whose position was steered by the scalar-prefetched
    slab starts; winner indices are window-relative (c*band + offset)."""
    c = pl.program_id(1)
    q = q_ref[:]                                        # (3, TQ)
    qn = jnp.sum(q * q, axis=0)
    tq = q.shape[1]
    r_block = r_ref.shape[1]
    n_sub = r_block // sub_chunk

    @pl.when(c == 0)
    def _():
        best_d_ref[:, :] = jnp.full_like(best_d_ref, 3.0e38)
        best_c_ref[:, :] = jnp.zeros_like(best_c_ref)

    for s in range(n_sub):
        r = r_ref[:, s * sub_chunk : (s + 1) * sub_chunk]
        rn = rn_ref[0, s * sub_chunk : (s + 1) * sub_chunk]
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = qn[:, None] + rn[None, :] - 2.0 * cross
        take = d2 < best_d_ref[:, :]
        best_d_ref[:, :] = jnp.where(take, d2, best_d_ref[:, :])
        best_c_ref[:, :] = jnp.where(take, c * n_sub + s, best_c_ref[:, :])

    @pl.when(c == 1)
    def _():
        best_d = best_d_ref[:, :]
        best_c = best_c_ref[:, :]
        lane = jnp.argmin(best_d, axis=1).astype(jnp.int32)
        d_min = jnp.min(best_d, axis=1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, best_d.shape, 1)
        onehot = (lane_iota == lane[:, None]).astype(jnp.int32)
        c_win = jnp.sum(best_c * onehot, axis=1)
        idx = c_win * sub_chunk + lane
        d_ref[:, :] = d_min.reshape(tq // 128, 128)
        i_ref[:, :] = idx.reshape(tq // 128, 128)


@functools.partial(jax.jit, static_argnames=("q_tile", "r_chunk", "sub_chunk"))
def nn1_pallas(query: jnp.ndarray, ref: jnp.ndarray, *, q_tile: int = 1024,
               r_chunk: int = 4096, sub_chunk: int = 256) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor of each query point in ref (sentinel-masked).

    query (Nq, 3), ref (Nr, 3) — padded with PAD_COORD sentinels.
    Returns (exact sqdist (Nq,), index (Nq,) int32).
    """
    nq, nr = query.shape[0], ref.shape[0]
    nq_pad = -(-nq // q_tile) * q_tile
    nr_pad = -(-nr // r_chunk) * r_chunk
    qp = jnp.pad(query, ((0, nq_pad - nq), (0, 0)), constant_values=0.0)
    # pad ref with sentinels so padding never wins
    rp = jnp.pad(ref, ((0, nr_pad - nr), (0, 0)), constant_values=1.0e6)
    rn = jnp.sum(rp * rp, axis=1)[None, :]              # (1, Nr)
    qT = qp.T                                            # (3, Nq) lane-major
    rT = rp.T                                            # (3, Nr)

    grid = (nq_pad // q_tile, nr_pad // r_chunk)
    d, i = pl.pallas_call(
        functools.partial(_nn1_kernel, sub_chunk=sub_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, q_tile), lambda g, c: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r_chunk), lambda g, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_chunk), lambda g, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile // 128, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile // 128, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad // 128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, sub_chunk), jnp.float32),
            pltpu.VMEM((q_tile, sub_chunk), jnp.int32),
        ],
    )(qT, rT, rn)
    d = d.reshape(nq_pad)[:nq]
    i = jnp.minimum(i.reshape(nq_pad)[:nq], nr - 1)
    # exact re-score (matmul expansion loses ~1e-4 m^2 at LiDAR scales)
    diff = query - ref[i]
    d_exact = jnp.sum(diff * diff, axis=1)
    return jnp.where(d >= BIG, BIG, d_exact), i
