"""Voxel-grid downsampling as sort + segment-mean (SURVEY N2).

Replaces ``PointCloud.voxel_down_sample`` (reference call sites
``ALL_FUNCTIONS.py:20,293-294``, ``2_MGICP_refinement...py:146-147``) with a
deterministic fixed-shape XLA program: quantize points to voxel coordinates,
sort by voxel key, segment-mean the points of each occupied voxel, and compact
the means to a masked prefix.  Matches Open3D's semantics (voxel index =
floor((p − min_bound)/voxel); output point = centroid of the voxel's points);
output *order* is lexicographic by voxel coordinate, which downstream ops never
depend on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.cloud import Cloud, PAD_COORD


@functools.partial(jax.jit, static_argnames=())
def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray, voxel_size) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Downsample (N, 3) masked points; returns (points (N, 3), mask (N,)).

    Output occupies a prefix of the same static shape (count = #occupied
    voxels); padding is parked at PAD_COORD.
    """
    n = points.shape[0]
    voxel_size = jnp.float32(voxel_size)
    # min over valid points only
    big = jnp.float32(3e38)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    ijk = jnp.floor((points - pmin) / voxel_size).astype(jnp.int32)
    # ONE lexicographic sort pass (lax.sort with two int32 keys) instead of
    # three stable argsorts: key_hi packs (i, j) at 15 bits each (32k cells
    # per axis — kilometres of extent at any shipped voxel size), key_lo = k.
    ijk = jnp.clip(ijk, 0, 2**15 - 1)
    key_hi = ijk[:, 0] * jnp.int32(2**15) + ijk[:, 1]
    key_lo = ijk[:, 2]
    imax = jnp.int32(2**31 - 1)
    key_hi = jnp.where(mask, key_hi, imax)  # padding sorts last
    key_lo = jnp.where(mask, key_lo, imax)
    s_hi, s_lo, order = jax.lax.sort(
        (key_hi, key_lo, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    s_pts = points[order]
    s_mask = mask[order]

    # Segment boundaries where the voxel key changes
    diff = (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])
    new_seg = jnp.concatenate([jnp.array([True]), diff]) & s_mask
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # -1 for leading invalids (none in practice)
    seg_id = jnp.where(s_mask, seg_id, n - 1)  # dump padding into the last bucket

    w = s_mask.astype(jnp.float32)
    sums = jax.ops.segment_sum(s_pts * w[:, None], seg_id, num_segments=n)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=n)
    n_voxels = jnp.sum(new_seg.astype(jnp.int32))
    out_mask = jnp.arange(n) < n_voxels
    means = jnp.where(
        (counts[:, None] > 0) & out_mask[:, None], sums / jnp.maximum(counts[:, None], 1.0), PAD_COORD
    )
    return means, out_mask


def voxel_downsample_cloud(c: Cloud, voxel_size) -> Cloud:
    pts, mask = voxel_downsample(c.points, c.mask, voxel_size)
    return Cloud(points=pts, mask=mask)
