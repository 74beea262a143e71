"""Fused per-scale preprocessing: voxel downsample -> statistical outlier
removal -> kNN normal estimation in ONE jit, gather-free.

This is the TPU answer to the reference's per-scale chain
(``2_MGICP_refinement...py:146-153``: ``voxel_down_sample`` ->
``remove_statistical_outlier(30, 1.0)`` -> ``estimate_normals(KNN 20)``).
Running the three ops separately costs two full self-kNN searches whose
epilogues dominate stage 2 (~100 ms/scale at 32k points, measured): the
banded distance matrix + ``approx_min_k`` fuse to ~1 ms in XLA, but gathering
the 31 candidate coordinates per point (a ~1M-row random gather) costs ~60 ms
and the (N, 31) argsort another ~13 ms.

So this op never materializes neighbor LISTS at all.  The key identity: every
quantity the chain needs is a *neighborhood reduction* —

  * outlier pass: mean distance to the 30 nearest (excluding self)
    = sum(sqrt(d2) * [d2 <= tau31]) / (count - 1),
  * normals pass: covariance of the 20 nearest survivors
    = first+second moments weighted by [d2 <= tau20] * keep,

where the per-query thresholds tau come from ``approx_min_k`` values (indices
never used).  The weighted sums run either as fused elementwise+reduce over
the banded d2 tiles or as one MXU matmul per tile
(weights (TQ, 2B) @ [x | xx^T | 1] (2B, 10)), with band coordinates centered
per tile so float32 keeps E[xx] - E[x]E[x]^T accurate.  Nothing random-access
touches HBM; the whole op runs at ~5 ms instead of ~100 ms at 32k points.

The output cloud is returned IN sorted-sweep-axis order: a ``Cloud`` is an
orderless set and every downstream consumer (band-GICP, FPFH, evaluation)
re-sorts or reduces anyway, so the scatter back to input order is skipped.

Semantics deviations from the exact ops/outlier.py + ops/normals.py chain
(both remain the exact, separately-testable reference implementations):
  * thresholds from approx_min_k (recall 0.99) may widen a neighborhood by a
    couple of points, and distance ties at the threshold are all included;
  * Open3D recomputes the normals 20-NN on the *filtered* cloud; we drop
    filtered-out candidates from the shared band instead — identical unless a
    removed point sat inside the 20-neighborhood (a few % of points);
  * with ``spacing_hint`` set, points lacking nb_neighbors+1 in-band
    neighbors within 100*hint are dropped outright AND excluded from the
    mu/sigma statistics, whereas Open3D (and ops/outlier.py) include every
    valid point in the statistics — on very sparse scans this makes the
    filter slightly stricter than the reference (deliberate: a 1e9 sentinel
    mean-distance would inflate sigma and let every real outlier through).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import eigen3
from . import voxel as voxel_ops
from ..utils.cloud import Cloud, PAD_COORD

BIG = jnp.float32(3.0e38)
SENTINEL = 1.0e6
REAL_D2_MAX = 1.0e10   # any query-candidate pair with d2 above this involves a sentinel


def outlier_and_normals_sorted(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    nb_neighbors: int = 30,
    std_ratio: float = 1.0,
    normal_k: int = 20,
    q_tile: int = 1024,
    band: int = 2048,
    spacing_hint=None,
    backend: str = "auto",
) -> Cloud:
    """Host-side validation wrapper (the guard must run before jit tracing
    turns ``spacing_hint`` into a tracer; see _outlier_and_normals_sorted).

    ``backend``: 'auto' = 'xla' — measured on v5e the fused XLA path beats
    the Pallas kernels (ops/pallas/feature_kernels O1/O2) on the 5-scale
    NCLT pyramid; the kernels remain selectable ('pallas', needs
    ``spacing_hint``) and oracle-tested ('pallas_interpret')."""
    if isinstance(spacing_hint, (int, float)) and not spacing_hint > 0:
        raise ValueError(f"spacing_hint must be > 0, got {spacing_hint}")
    if backend == "auto":
        backend = "xla"   # measured faster than the pallas path on v5e
    if backend.startswith("pallas"):
        if spacing_hint is None:
            raise ValueError("pallas preprocess backend needs spacing_hint")
        return _outlier_and_normals_pallas(
            points, mask, nb_neighbors, std_ratio, normal_k, band,
            float(spacing_hint), interpret=(backend == "pallas_interpret"))
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")
    return _outlier_and_normals_sorted(
        points, mask, nb_neighbors, std_ratio, normal_k, q_tile, band,
        spacing_hint,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nb_neighbors", "std_ratio", "normal_k", "band",
                     "spacing_hint", "interpret"))
def _outlier_and_normals_pallas(
    points, mask, nb_neighbors, std_ratio, normal_k, band, spacing_hint,
    interpret=False,
) -> Cloud:
    """Pallas backend: O1 (outlier stats) -> (n,)-level mu/sigma gate in XLA
    -> O2 (survivor-kNN moments) -> normals.  Identical semantics to the XLA
    path's spacing_hint branch (same bisections, same deviation notes in the
    module docstring)."""
    from ..ops.pallas import feature_kernels as fk

    q_tile = 256                     # kernel VMEM budget (see feature_kernels)
    n = points.shape[0]
    p = jnp.where(mask[:, None], points, SENTINEL)
    big = jnp.float32(3e38)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    axis = jnp.argmax(pmax - pmin)
    pa = p @ (jnp.arange(3) == axis).astype(p.dtype)
    order = jnp.argsort(pa).astype(jnp.int32)
    ps = p[order]
    ms = mask[order]

    n_pad = -(-n // q_tile) * q_tile
    nr_pad = (-(-n // band) + 1) * band
    n_tiles = n_pad // q_tile
    tile_start_row = jnp.arange(n_tiles, dtype=jnp.int32) * q_tile
    start_blk = jnp.clip((tile_start_row - (2 * band - q_tile) // 2) // band,
                         0, jnp.maximum(nr_pad // band - 2, 0))
    qT = jnp.pad(ps, ((0, n_pad - n), (0, 0)), constant_values=SENTINEL).T
    rT = jnp.pad(ps, ((0, nr_pad - n), (0, 0)), constant_values=SENTINEL).T

    mean_d_p, found_p, tau_out_p = fk.outlier_stats_pallas(
        start_blk, qT, rT, spacing_hint, q_tile=q_tile, band=band,
        k1=nb_neighbors + 1, interpret=interpret)
    mean_d, found = mean_d_p[:n], found_p[:n]

    stat = ms & found
    wv = stat.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(wv), 1.0)
    mu = jnp.sum(mean_d * wv) / n_valid
    var = jnp.sum((mean_d - mu) ** 2 * wv) / jnp.maximum(n_valid - 1.0, 1.0)
    keep = stat & (mean_d <= mu + std_ratio * jnp.sqrt(var))

    S = fk.survivor_moments_pallas(
        start_blk, qT, rT, tau_out_p, keep, q_tile=q_tile, band=band,
        normal_k=normal_k, interpret=interpret)[:n]
    cnt2 = jnp.maximum(S[:, 9], 1.0)
    m1 = S[:, 0:3] / cnt2[:, None]
    xx = S[:, 3], S[:, 4], S[:, 5], S[:, 6], S[:, 7], S[:, 8]
    exx = jnp.stack(
        [jnp.stack([xx[0], xx[1], xx[2]], axis=-1),
         jnp.stack([xx[1], xx[3], xx[4]], axis=-1),
         jnp.stack([xx[2], xx[4], xx[5]], axis=-1)],
        axis=-2,
    ) / cnt2[:, None, None]
    cov = exx - m1[:, :, None] * m1[:, None, :]
    enough = S[:, 9] >= 3
    normals = eigen3.smallest_eigenvector(cov)
    flip = (normals[:, 2] < 0) | ((normals[:, 2] == 0) & (normals[:, 0] < 0))
    normals = jnp.where(flip[:, None], -normals, normals)
    normals = jnp.where((enough & keep)[:, None], normals, 0.0)
    pts_out = jnp.where(keep[:, None], ps, PAD_COORD)
    return Cloud(points=pts_out, mask=keep, normals=normals, covariances=cov)


@functools.partial(
    jax.jit,
    static_argnames=("nb_neighbors", "normal_k", "q_tile", "band"),
)
def _outlier_and_normals_sorted(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    nb_neighbors: int = 30,
    std_ratio: float = 1.0,
    normal_k: int = 20,
    q_tile: int = 1024,
    band: int = 2048,
    spacing_hint=None,
) -> Cloud:
    """Fused outlier-removal + normals.  Returns a Cloud whose rows are in
    sorted-sweep-axis order (a permutation of the input's valid rows).

    ``spacing_hint`` (typically the voxel size of the cloud) switches the
    pass-1 neighborhood threshold from ``approx_min_k`` to a log-space count
    bisection over [0.05*hint, 100*hint] (10 static steps): approx_min_k is the single most
    expensive op here (18 of 26 ms at 17k points, measured), while each
    bisection step is a read-only fused reduce over the CSE'd distance matrix
    (~0.35 ms).  14 steps resolve the threshold to <0.1%, well inside
    approx_min_k's own recall_target=0.99 slack."""
    n = points.shape[0]

    # --- one sort along the largest-extent axis --------------------------
    p = jnp.where(mask[:, None], points, SENTINEL)
    big = jnp.float32(3e38)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    axis = jnp.argmax(pmax - pmin)
    pa = p @ (jnp.arange(3) == axis).astype(p.dtype)
    order = jnp.argsort(pa).astype(jnp.int32)
    ps = p[order]
    ms = mask[order]

    n_pad = -(-n // q_tile) * q_tile
    nr_pad = (-(-n // band) + 1) * band
    p_q = jnp.pad(ps, ((0, n_pad - n), (0, 0)), constant_values=SENTINEL)
    p_r = jnp.pad(ps, ((0, nr_pad - n), (0, 0)), constant_values=SENTINEL)
    n_tiles = n_pad // q_tile

    tile_start_row = jnp.arange(n_tiles, dtype=jnp.int32) * q_tile
    start_blk = jnp.clip((tile_start_row - (2 * band - q_tile) // 2) // band,
                         0, jnp.maximum(nr_pad // band - 2, 0))
    starts_el = start_blk * band

    rows = starts_el[:, None] + jnp.arange(2 * band, dtype=jnp.int32)[None, :]
    bands = p_r[rows]                                   # (T, 2B, 3) contiguous slabs
    band_n2 = jnp.sum(bands * bands, axis=-1)
    q_t = p_q.reshape(n_tiles, q_tile, 3)
    qn = jnp.sum(q_t * q_t, axis=-1)

    def d2_tiles():
        cross = jnp.einsum("tqd,tbd->tqb", q_t, bands,
                           preferred_element_type=jnp.float32)
        return qn[..., None] + band_n2[:, None, :] - 2.0 * cross

    # --- pass 1: outlier statistics (30-NN mean distance, excluding self) --
    d2 = d2_tiles()
    real = d2 < REAL_D2_MAX
    if spacing_hint is None:
        dk, _ = jax.lax.approx_min_k(d2, nb_neighbors + 1, recall_target=0.99)
        tau_out = dk[..., -1]                            # ~ (nb+1)-th smallest incl self
    else:
        # log-space bisection on the neighbor-count CDF for the (nb+1)-th
        # smallest (incl self); each step is a fused reduce over d2.
        k1 = nb_neighbors + 1
        shape = d2.shape[:-1]
        llo = jnp.full(shape, 2.0 * jnp.log(0.05 * spacing_hint))
        lhi = jnp.full(shape, 2.0 * jnp.log(100.0 * spacing_hint))
        for _ in range(10):                              # static unroll: keeps fusion
            lmid = 0.5 * (llo + lhi)
            c1 = jnp.sum(real & (d2 <= jnp.exp(lmid)[..., None]), axis=-1)
            geq = c1 >= k1
            llo = jnp.where(geq, llo, lmid)
            lhi = jnp.where(geq, lmid, lhi)
        tau_out = jnp.exp(lhi)
        # queries whose 31-NN lies beyond the ceiling (sparse stragglers):
        # their true mean distance is >= 100 voxels, far past any mu+sigma
        # gate, so drop them outright — and EXCLUDE them from the mu/sigma
        # statistics (a 1e9 sentinel there would inflate sigma and let every
        # real outlier through).
        c_hi = jnp.sum(real & (d2 <= tau_out[..., None]), axis=-1)
        found = (c_hi >= k1).reshape(n_pad)[:n]
    w_out = (d2 <= tau_out[..., None]) & real
    cnt = jnp.sum(w_out, axis=-1)                        # includes self
    sum_d = jnp.sum(jnp.where(w_out, jnp.sqrt(jnp.maximum(d2, 0.0)), 0.0), axis=-1)
    mean_d = (sum_d / jnp.maximum(cnt - 1, 1)).reshape(n_pad)[:n]

    stat = ms if spacing_hint is None else (ms & found)
    wv = stat.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(wv), 1.0)
    mu = jnp.sum(mean_d * wv) / n_valid
    var = jnp.sum((mean_d - mu) ** 2 * wv) / jnp.maximum(n_valid - 1.0, 1.0)
    keep = stat & (mean_d <= mu + std_ratio * jnp.sqrt(var))

    # --- pass 2: normal covariances over the `normal_k` nearest survivors --
    # The survivor-kNN threshold comes from BISECTION on the neighbor-count
    # CDF: each count is a fused elementwise+reduce over the recomputed d2
    # tiles (~free, like pass 1), whereas a second approx_min_k on the masked
    # distance matrix breaks the matmul fusion and costs ~60 ms (measured).
    keep_r = jnp.pad(keep, (0, nr_pad - n), constant_values=False)
    keep_b = keep_r[rows]                                # (T, 2B) slab slices

    lo = jnp.zeros_like(tau_out)
    hi = 4.0 * tau_out + 1e-6
    d2b = d2_tiles()   # hoisted: one explicit compute, not 11 CSE'd call sites
    keep_real = keep_b[:, None, :] & (d2b < REAL_D2_MAX)
    for _ in range(10):                                  # static unroll: keeps fusion
        mid = 0.5 * (lo + hi)
        c2 = jnp.sum(keep_real & (d2b <= mid[..., None]), axis=-1)
        geq = c2 >= normal_k
        lo = jnp.where(geq, lo, mid)
        hi = jnp.where(geq, mid, hi)
    tau_nrm = hi
    w_nrm = keep_real & (d2b <= tau_nrm[..., None])

    # moments via one MXU matmul per tile, band coords centered per tile
    center = jnp.sum(jnp.where((band_n2 < REAL_D2_MAX)[..., None], bands, 0.0), axis=1)
    center = center / jnp.maximum(
        jnp.sum((band_n2 < REAL_D2_MAX), axis=1), 1)[:, None]
    bc = bands - center[:, None, :]                      # (T, 2B, 3)
    feats = jnp.concatenate(
        [
            bc,                                           # x y z
            bc[..., 0:1] * bc,                            # xx xy xz
            bc[..., 1:2] * bc[..., 1:3],                  # yy yz
            bc[..., 2:3] * bc[..., 2:3],                  # zz
            jnp.ones(bc.shape[:-1] + (1,), bc.dtype),     # count
        ],
        axis=-1,
    )                                                     # (T, 2B, 10)
    S = jnp.einsum("tqb,tbf->tqf", w_nrm.astype(jnp.float32), feats,
                   preferred_element_type=jnp.float32)    # (T, TQ, 10)
    S = S.reshape(n_pad, 10)[:n]
    cnt2 = jnp.maximum(S[:, 9], 1.0)
    m1 = S[:, 0:3] / cnt2[:, None]                        # E[x] (centered frame)
    xx = S[:, 3], S[:, 4], S[:, 5], S[:, 6], S[:, 7], S[:, 8]
    exx = jnp.stack(
        [jnp.stack([xx[0], xx[1], xx[2]], axis=-1),
         jnp.stack([xx[1], xx[3], xx[4]], axis=-1),
         jnp.stack([xx[2], xx[4], xx[5]], axis=-1)],
        axis=-2,
    ) / cnt2[:, None, None]                               # E[xx^T]
    cov = exx - m1[:, :, None] * m1[:, None, :]

    enough = S[:, 9] >= 3
    normals = eigen3.smallest_eigenvector(cov)
    flip = (normals[:, 2] < 0) | ((normals[:, 2] == 0) & (normals[:, 0] < 0))
    normals = jnp.where(flip[:, None], -normals, normals)
    normals = jnp.where((enough & keep)[:, None], normals, 0.0)

    pts_out = jnp.where(keep[:, None], ps, PAD_COORD)
    return Cloud(points=pts_out, mask=keep, normals=normals, covariances=cov)


def preprocess_scale_fused(
    c: Cloud,
    voxel_size: float,
    scale_capacity: int | None = None,
    nb_neighbors: int = 30,
    std_ratio: float = 1.0,
    normal_k: int = 20,
) -> Cloud:
    """Voxel downsample -> fused outlier+normals (sorted-order output).

    Drop-in accelerated equivalent of models/multiscale._preprocess_scale.
    """
    if not voxel_size > 0.0:
        # spacing_hint enters jnp.log(); <= 0 would silently produce NaN
        # bisection bounds and drop every point.
        raise ValueError(f"voxel_size must be > 0, got {voxel_size}")
    d = voxel_ops.voxel_downsample_cloud(c, voxel_size)
    if scale_capacity is not None and scale_capacity < d.capacity:
        # voxel output is prefix-compact (valid rows first), so a static
        # slice replaces compact()'s argsort+gathers.
        d = Cloud(points=d.points[:scale_capacity], mask=d.mask[:scale_capacity])
    # Capacity-scaled band: the preprocess neighborhoods are 30-NN / 20-NN
    # (a few voxels across), so nr/16 rows either side (~extent/8 along the
    # sweep axis) is still orders of magnitude wider than any neighborhood —
    # and the band width multiplies EVERY bisection step's reduction, the
    # dominant pyramid cost (round-5 stage-2 plateau).
    band = min(1024, max(256, -(-(d.capacity // 16) // 256) * 256))
    return outlier_and_normals_sorted(
        d.points, d.mask, nb_neighbors, std_ratio, normal_k, band=band,
        spacing_hint=float(voxel_size))
